package graft

import org.apache.spark.sql.functions._

import graft.etl.Encodings._

class EncodingsSpec extends SparkSpec {
  import spark.implicits._

  test("sigmoid is the inverse of logit on (0,1)") {
    val df = Seq(0.01, 0.2, 0.5, 0.8, 0.99).toDF("p")
    val back = df.select(sigmoid(logit($"p")).as("q")).as[Double].collect()
    back.zip(Seq(0.01, 0.2, 0.5, 0.8, 0.99)).foreach { case (q, p) =>
      assert(math.abs(q - p) < 1e-12)
    }
  }

  test("sigmoid is stable in both tails") {
    val df = Seq(-750.0, -50.0, 50.0, 750.0).toDF("x")
    val v = df.select(sigmoid($"x").as("s")).as[Double].collect()
    assert(v(0) === 0.0 && v(1) < 1e-20 && v(2) > 1.0 - 1e-15 && v(3) === 1.0)
    assert(!v.exists(_.isNaN))
  }

  test("oneHot creates sanitized indicator columns that sum to 1") {
    val df = Seq("1-URGENT", "5-LOW", "NOT SPECIFIED").toDF("pr")
    val enc = oneHot(df, "pr", Seq("1-URGENT", "5-LOW", "NOT SPECIFIED"), "d")
    assert(enc.columns.toSet ==
      Set("pr", "d_1_urgent", "d_5_low", "d_not_specified"))
    val sums = enc.select(
      ($"d_1_urgent" + $"d_5_low" + $"d_not_specified").as("s"))
      .as[Int].collect()
    assert(sums.forall(_ == 1))
  }

  test("xBeta matches hand-computed affine combination") {
    val df = Seq((1.0, 2.0), (0.0, -1.0)).toDF("a", "b")
    val v = df.select(
      xBeta(0.5, Seq(($"a", 2.0), ($"b", -0.25))).as("xb"))
      .as[Double].collect()
    assert(math.abs(v(0) - (0.5 + 2.0 - 0.5)) < 1e-12)
    assert(math.abs(v(1) - (0.5 + 0.25)) < 1e-12)
  }

  test("rowId is deterministic and dense from 1") {
    val df = Seq("c", "a", "b").toDF("k")
    val ids = rowId(df, Seq("k"), "id").orderBy("k")
      .select("id").as[Int].collect()
    assert(ids.toSeq == Seq(1, 2, 3))
  }

  test("contiguousId equals rowId semantics without the global window") {
    val df = (1 to 500).map(i => (i * 7919 % 500, s"p$i")).toDF("k", "p")
      .repartition(11)
    val viaWindow = rowId(df, Seq("k", "p"), "id")
      .orderBy("k", "p").select("id").as[Int].collect().map(_.toLong)
    val viaZip = contiguousId(df, Seq("k", "p"), "id")
      .orderBy("k", "p").select("id").as[Long].collect()
    assert(viaZip.toSeq == viaWindow.toSeq)
    assert(viaZip.head == 1L && viaZip.last == 500L)
  }

  test("fingerprintId is stable across evaluations") {
    val df = Seq(("x", 1), ("y", 2)).toDF("k", "v")
    val a = fingerprintId(df, Seq("k", "v")).select("id").as[Long].collect()
    val b = fingerprintId(df, Seq("k", "v")).select("id").as[Long].collect()
    assert(a.toSeq == b.toSeq && a.distinct.length == 2)
  }
}
