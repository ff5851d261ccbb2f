package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.functions.TopKPairs

/** Direct randomized equivalence gate for the native bounded top-k
  * aggregate — the ranking stage of every ANN path (s01-s17), the
  * relational grouped top-k (q67) and the streaming per-window top-k
  * (st11). The plan-level no-window assertions live in PlanSpec /
  * SimilaritySpec; here the VALUE contract is fuzzed: for arbitrary
  * scored data (ties, negatives, duplicate scores across groups,
  * k larger than the group) the aggregate must reproduce the
  * row_number window it replaces, on every k and any partitioning.
  */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: topK equals the row_number window for random scored " +
      "data with ties, every k, any partitioning") {
    TopKPairs.register(spark)
    val rowGen = for {
      g <- Gen.chooseNum(0, 3)
      id <- Gen.chooseNum(0L, 40L)
      // coarse grid => many exact ties, the regime where the
      // tie-break rule could plausibly diverge from the window's
      s <- Gen.chooseNum(-5, 5).map(_ / 2.0)
    } yield (g, id, s)
    val dataGen = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, rowGen)
      k <- Gen.oneOf(1, 2, 3, 7)
      parts <- Gen.oneOf(1, 3, 8)
    } yield (rows.distinct, k, parts)
    var seed = rng.Seed(20260814L)
    for (_ <- 1 to 10) {
      val (rows, k, parts) = dataGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = rows.toDF("g", "id", "s").repartition(parts)
      val agg = df.groupBy("g")
        .agg(TopKPairs.topK(round(col("s"), 6), col("id"), col("s"), k,
          lit(0L)).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("g"), (col("pos") + 1).as("rank"),
          col("t.nbr_id").as("id"), col("t.score").as("s"))
        .as[(Int, Int, Long, Double)].collect().toSet
      val w = Window.partitionBy("g")
        .orderBy(round(col("s"), 6).desc, col("id"))
      val win = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank"), col("id"), col("s"))
        .as[(Int, Int, Long, Double)].collect().toSet
      assert(agg == win,
        s"k=$k parts=$parts rows=$rows\nagg=$agg\nwin=$win")
    }
  }
}
