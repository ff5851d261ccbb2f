package graft

import org.apache.spark.sql.functions._

import graft.stats.Survey

class SurveySpec extends SparkSpec {
  import spark.implicits._

  test("rake matches IPF margins: last margin exact, first converging") {
    val rnd = new scala.util.Random(5)
    // biased sample: category frequencies deliberately off the targets
    val rows = (0 until 600).map { i =>
      val a = if (rnd.nextDouble() < 0.7) "a1" else "a2"
      val b = s"b${rnd.nextInt(4)}"
      (i.toLong, a, b, 1.0)
    }
    val df = rows.toDF("id", "ca", "cb", "w")
    val ta = Seq(("a1", 300.0), ("a2", 300.0)).toDF("ca", "_target")
    val tb = Seq(("b0", 100.0), ("b1", 200.0), ("b2", 150.0),
      ("b3", 150.0)).toDF("cb", "_target")
    val raked = Survey.rake(df, "w", Seq("ca" -> ta, "cb" -> tb),
      iters = 5).cache()
    // the LAST margin of the final cycle is matched exactly
    val bm = raked.groupBy("cb").agg(sum("w").as("s"))
      .as[(String, Double)].collect().toMap
    Seq("b0" -> 100.0, "b1" -> 200.0, "b2" -> 150.0, "b3" -> 150.0)
      .foreach { case (c, t) =>
        assert(math.abs(bm(c) - t) < 1e-9, s"$c: ${bm(c)}") }
    // earlier margins converge geometrically — close after 5 cycles
    val am = raked.groupBy("ca").agg(sum("w").as("s"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(am("a1") - 300.0) < 0.5, s"a1: ${am("a1")}")
    assert(math.abs(am("a2") - 300.0) < 0.5, s"a2: ${am("a2")}")
    // total mass equals the (shared) margin total
    val tot = raked.agg(sum("w")).head().getDouble(0)
    assert(math.abs(tot - 600.0) < 1e-9)
    // partitioning-invariant on rounded weights
    val again = Survey.rake(df.repartition(7), "w",
        Seq("ca" -> ta, "cb" -> tb), iters = 5)
      .select($"id", round($"w", 9).as("w"))
      .as[(Long, Double)].collect().toMap
    val first = raked.select($"id", round($"w", 9).as("w"))
      .as[(Long, Double)].collect().toMap
    assert(again == first)
  }
}
