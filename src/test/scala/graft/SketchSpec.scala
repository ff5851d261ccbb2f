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
}
