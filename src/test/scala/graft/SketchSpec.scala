package graft

import org.apache.spark.sql.functions._

import graft.queries.RelQueries

/** Mergeable HLL distinct-count sketches (q43): estimate quality and
  * the algebraic properties the daily-partials-then-rollup pattern
  * relies on at scale — a union of per-day sketches must stand in for
  * a sketch of the whole month.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val result =
    SparkEntry.queries("q43_approx_distinct")(spark, sf001)
      .as[(String, Long, Long)].collect().toSeq

  test("q43: per-day and month estimates within 5% of exact") {
    assert(result.nonEmpty)
    result.foreach { case (scope, est, exact) =>
      assert(exact > 0, scope)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$scope: est=$est exact=$exact")
    }
  }

  test("q43: month row present and consistent with the day rows") {
    val total = result.filter(_._1 == "month_total")
    assert(total.size == 1)
    // the union estimate can't exceed the sum of day-level exacts and
    // can't be below any single day's exact count (monotonicity)
    val dayExacts = result.filterNot(_._1 == "month_total").map(_._3)
    assert(total.head._2 <= dayExacts.sum)
    assert(total.head._2 >= dayExacts.max * 95 / 100)
  }

  test("hll union is associative: two-stage merge equals one-stage " +
      "(the partial-rollup property the daily-sketch pattern needs)") {
    val ev = RelQueries.events(spark, sf001)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = ev.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        dayofmonth(col("day")).as("dom"))
    val oneStage = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Double].head()
    val half1 = daily.filter(col("dom") <= 15)
      .agg(hll_union_agg(col("sk")).as("u")).select(col("u"))
    val half2 = daily.filter(col("dom") > 15)
      .agg(hll_union_agg(col("sk")).as("u")).select(col("u").as("u2"))
    val twoStage = half1.crossJoin(half2)
      .select(hll_sketch_estimate(hll_union(col("u"), col("u2")))
        .as("est"))
      .as[Double].head()
    assert(math.abs(oneStage - twoStage) <= 1e-6 * math.max(1.0, oneStage),
      s"one=$oneStage two=$twoStage")
  }

  test("q45: approx percentile rank error within 2% of the target " +
      "quantile (GK sketch vs the exact CDF)") {
    val approx = SparkEntry.queries("q45_approx_percentiles")(spark, sf001)
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    val li = Tables(spark, sf001, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).cache()
    try approx.foreach { case (flag, p25, p50, p75) =>
      val grp = li.filter(col("l_returnflag") === flag)
      val n = grp.count().toDouble
      Seq(0.25 -> p25, 0.5 -> p50, 0.75 -> p75).foreach { case (p, v) =>
        val below = grp.filter(col("l_extendedprice") <= v).count()
        assert(math.abs(below / n - p) <= 0.02,
          s"$flag p$p: value $v sits at rank ${below / n}")
      }
    } finally li.unpersist()
  }

  test("q43: sketch aggregation is deterministic across partitionings") {
    val a = SparkEntry.queries("q43_approx_distinct")(spark, sf001)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val ev = RelQueries.events(spark, sf001)
      .repartition(13, col("event_id"))
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val b = ev.groupBy("day")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .cast("long").as("est"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("scope"), col("est"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val aDays = a.filterNot(_._1 == "month_total").map(t => (t._1, t._2))
    assert(aDays == b)
  }

  test("d31: approx_top_k is exact when the tracked budget covers the " +
      "domain, finds true heavy hitters when it doesn't, and is " +
      "partitioning-invariant") {
    // zipf-ish: item i appears ~ 20000/(i+1) times, 200 distinct items
    val df = spark.range(200).select(
        explode(sequence(lit(1), (lit(20000) / (col("id") + 1))
          .cast("int"))).as("rep"),
        concat(lit("it"), col("id")).as("item"))
      .select("item")
    def topk(d: org.apache.spark.sql.DataFrame, k: Int) =
      d.agg(expr(s"approx_top_k(item, $k)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item"), col("e.count"))
        .as[(String, Long)].collect().sortBy(t => (-t._2, t._1)).toSeq
    val exact = df.groupBy("item").count()
      .as[(String, Long)].collect().sortBy(t => (-t._2, t._1)).toSeq
    // budget >= domain: the whole histogram, exactly
    assert(topk(df, 10000).size == 200 && topk(df, 10000) == exact)
    // tight budget: the true top-10 survive with exact counts (zipf
    // head dwarfs the sketch's small-count error band)
    assert(topk(df, 10).toSet == exact.take(10).toSet)
    // map-side partials merge to the same answer under any layout
    assert(topk(df.repartition(13), 10000) == exact)
  }

  // ---- SQL-replayable HLL (ops.Hll, gated as s29/s30) ----------------

  test("hll: registerOf/rhoOf agree with bit arithmetic on crafted hex") {
    import graft.ops.Hll
    // (hex18, register, rho): each lz CASE branch, the whole-digit
    // run, and the all-zero 61 edge
    val cases = Seq(
      ("fff" + "8" + "0" * 14, 4095, 1),
      ("000" + "4" + "0" * 14, 0, 2),
      ("a2b" + "2" + "f" * 14, 2603, 3),
      ("00f" + "1" + "0" * 14, 15, 4),
      ("123" + "08" + "0" * 13, 291, 5),
      ("123" + "01" + "0" * 13, 291, 8),
      ("7ff" + "0" * 14 + "1", 2047, 60),
      ("abc" + "0" * 15, 2748, 61))
    val df = cases.map(_._1).toDF("h")
      .select(col("h"), Hll.registerOf(col("h")).as("r"),
        Hll.rhoOf(col("h")).as("rho"))
    val got = df.as[(String, Int, Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    cases.foreach { case (h, r, rho) =>
      assert(got(h) == (r, rho), s"hex=$h")
    }
  }

  test("hll: registers match an independent MessageDigest reference") {
    import graft.ops.Hll
    val keys = (1L to 3000L).map(_ * 7919L)
    def refDraw(k: Long): (Int, Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((k.toString + "t").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val reg = Integer.parseInt(hex.substring(0, 3), 16)
      val win = hex.substring(3, 18)
      val t = win.dropWhile(_ == '0')
      val rho = if (t.isEmpty) 61
        else {
          val v = Integer.parseInt(t.take(1), 16)
          val lz = if (v >= 8) 0 else if (v >= 4) 1 else if (v >= 2) 2 else 3
          4 * (15 - t.length) + lz + 1
        }
      (reg, rho)
    }
    val expect = keys.map(refDraw)
      .groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).max }
    val got = Hll.registers(keys.toDF("k"), col("k"), "t")
      .as[(Int, Int)].collect().toMap
    assert(got == expect)
  }

  test("hll: merge of per-part sketches equals the sketch of the union " +
      "(the s30 rollup contract)") {
    import graft.ops.Hll
    val a = spark.range(1, 20000).toDF("k")
    val b = spark.range(15000, 40000).toDF("k")
    val direct = Hll.registers(a.unionByName(b), col("k"), "u")
      .as[(Int, Int)].collect().toMap
    val merged = Hll.merge(
        Hll.registers(a, col("k"), "u")
          .unionByName(Hll.registers(b, col("k"), "u")))
      .as[(Int, Int)].collect().toMap
    assert(merged == direct)
  }

  test("hll: est_raw is bit-identical to an exact BigInt recompute of " +
      "the summary's fixed double tree") {
    import graft.ops.Hll
    val regs = Hll.merge(
      Hll.registers(spark.range(1, 30000).toDF("k"), col("k"), "e"))
    val row = Hll.summary(regs).collect().head
    val table = regs.as[(Int, Int)].collect()
    val sExact = table.map(t => BigInt(1) << (61 - t._2)).sum
    val sHi = (sExact >> 32).toLong
    val sLo = (sExact & 0xffffffffL).toLong
    assert(row.getLong(3) == sHi && row.getLong(4) == sLo)
    assert(row.getLong(1) == table.length &&
      row.getLong(2) == Hll.M - table.length)
    val denom = (sHi.toDouble * 4294967296.0 + sLo.toDouble) / Hll.Scale +
      (Hll.M - table.length).toDouble
    val est = Hll.AlphaM2 / denom + 0.0
    assert(java.lang.Double.doubleToRawLongBits(row.getDouble(5)) ==
      java.lang.Double.doubleToRawLongBits(est))
  }

  test("hll: corrected estimate within 5% of truth across regimes " +
      "(linear-counting and raw)") {
    import graft.ops.Hll
    for (n <- Seq(500L, 5000L, 60000L)) {
      val row = Hll.summary(Hll.merge(Hll.registers(
          spark.range(1, n + 1).toDF("k"), col("k"), "a"))).collect().head
      val est = Hll.corrected(row.getDouble(5), row.getLong(2))
      assert(math.abs(est - n) / n <= 0.05, s"n=$n est=$est")
    }
  }

  test("s30: registry summary is consistent and corrected-accurate on " +
      "the harness events") {
    import graft.ops.Hll
    val row = SparkEntry.queries("s30_hll_merge_estimate")(spark, sf001)
      .collect().head
    assert(row.getInt(0) == Hll.M)
    assert(row.getLong(1) + row.getLong(2) == Hll.M)
    val exact = RelQueries.events(spark, sf001)
      .select(countDistinct(col("event_id"))).as[Long].head()
    val est = Hll.corrected(row.getDouble(5), row.getLong(2))
    assert(math.abs(est - exact) / exact <= 0.05, s"est=$est exact=$exact")
  }
}
