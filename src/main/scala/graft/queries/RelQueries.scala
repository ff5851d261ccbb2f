package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Encodings._
import graft.rel.Relational
import graft.stats.Survey

/** Relational/ETL operator coverage (SURVEY.md §2.2-2.6) expressed over
  * the TPC-H-ish harness tables, each paired with a DuckDB oracle in
  * [[oracles]]. Column names and rounding are kept identical on both
  * sides — the driver hash-compares values after sorting columns by name.
  *
  * Scale notes: every query here is one shuffle (or zero); dimension
  * joins (nation/region, <=25/5 rows) broadcast via Catalyst/AQE; all
  * aggregates are algebraic so map-side partial aggregation applies.
  */
object RelQueries {

  /** q70's built-and-ANALYZEd catalog tables (name -> backing path);
    * a Fixtures-registered memo so the bench's coldReset forces a
    * true rebuild (see the q70 entry comment).
    */
  private val cboBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  graft.Fixtures.onReset(() => cboBuilt.clear())

  /** Build-once Versioned table fixture shared by q73/q74: v1 = the
    * orders snapshot range-split into 8 immutable files, v2 = a MERGE
    * commit (updates %31 -> status 'X' +10% price, deletes %37,
    * inserts %41 into net-new key space) that rewrites only the files
    * whose key range the batch touches.
    */
  private[queries] def timeTravelRoot(s: SparkSession,
                                      dir: String): String = {
    import graft.sources.Versioned
    val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
    val root = new java.io.File(
      graft.TempDirs.scratchRoot, s"graft-q73-$key")
      .getAbsolutePath
    val base = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    if (!Versioned.hasVersion(root, 2)) {
      graft.TempDirs.registerCleanedAtExit(root)
      Versioned.write(base, root, "o_orderkey", version = 1, nFiles = 8)
      Versioned.merge(s, root, "o_orderkey", "op",
        timeTravelChanges(base), fromVersion = 1, toVersion = 2)
    }
    root
  }

  /** Next 10M-multiple key-space offset above the table's max key —
    * the SF-proof "net-new insert" region (a fixed constant is
    * net-new at sf0.01 but collides with occupied key space at larger
    * SFs; the oracles compute the identical integer arithmetic).
    */
  private[queries] def insertOffset(base: DataFrame,
                                    keyCol: String): Long =
    (base.agg(max(col(keyCol))).head().getLong(0)
      / 10000000L + 1L) * 10000000L

  /** The q73/q74/st13 change batch over the orders snapshot (keys
    * unique across the batch — the mergeUpsert contract).
    */
  private[queries] def timeTravelChanges(base: DataFrame): DataFrame =
    base
      .filter(col("o_orderkey") % 31 === 0
        || col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
        (floor(col("o_totalprice") * 1.1 * 100 + 0.5) / 100)
          .as("o_totalprice"),
        when(col("o_orderkey") % 37 === 0, "D").otherwise("U")
          .as("op"))
      .unionByName(base.filter(col("o_orderkey") % 41 === 0)
        .select((col("o_orderkey") + insertOffset(base, "o_orderkey"))
            .as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
          lit("U").as("op")))

  /** Build-once fixture for q85 (add-column schema evolution): v1 =
    * the orders snapshot in 8 files; v2 = a merge whose change batch
    * carries a NEW column `o_tier` (updates %23 -> status 'E' +2%
    * price + tier hi/lo, deletes %29, inserts %41 into net-new key
    * space tagged 'new'). Only range-affected files are rewritten —
    * untouched files keep the old on-disk schema and read as nulls
    * through mergeSchema.
    */
  private[queries] def schemaEvoRoot(s: SparkSession,
                                     dir: String): String = {
    import graft.sources.Versioned
    val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
    val root = new java.io.File(
      graft.TempDirs.scratchRoot, s"graft-q85-$key")
      .getAbsolutePath
    if (!Versioned.hasVersion(root, 2)) {
      graft.TempDirs.registerCleanedAtExit(root)
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Versioned.write(base, root, "o_orderkey", version = 1, nFiles = 8)
      // derived offset, not a fixed constant: a fixed +30M is net-new
      // at sf0.01 but lands inside occupied key space at larger SFs
      // (caught by the round-8 sf1 oracle check), where a colliding
      // "insert" both upserts existing rows and can put the same key
      // twice into the change batch — breaking mergeUpsert's
      // one-row-per-key contract. The oracles replay the identical
      // integer arithmetic.
      val off = insertOffset(base, "o_orderkey")
      val changes = base
        .filter(col("o_orderkey") % 23 === 0
          || col("o_orderkey") % 29 === 0)
        .select(col("o_orderkey"), lit("E").as("o_orderstatus"),
          (floor(col("o_totalprice") * 1.02 * 100 + 0.5) / 100)
            .as("o_totalprice"),
          when(col("o_totalprice") > 150000, "hi").otherwise("lo")
            .as("o_tier"),
          when(col("o_orderkey") % 29 === 0, "D").otherwise("U")
            .as("op"))
        .unionByName(base.filter(col("o_orderkey") % 41 === 0)
          .select((col("o_orderkey") + off).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(5.0).as("o_totalprice"),
            lit("new").as("o_tier"), lit("U").as("op")))
      Versioned.merge(s, root, "o_orderkey", "op", changes,
        fromVersion = 1, toVersion = 2)
    }
    root
  }

  /** Build-once fixture for q86 (merge-on-read deletes): v1 = the
    * orders snapshot in 8 files; v2/v3 = stacked tombstone-only
    * commits (%13 then %17 — zero data files rewritten); v4 =
    * compaction folding both tombstone sets into rewritten data files.
    */
  private[graft] def morRoot(s: SparkSession, dir: String): String = {
    import graft.sources.Versioned
    val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
    val root = new java.io.File(
      graft.TempDirs.scratchRoot, s"graft-q86-$key")
      .getAbsolutePath
    if (!Versioned.hasVersion(root, 4)) {
      graft.TempDirs.registerCleanedAtExit(root)
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
      Versioned.write(base, root, "o_orderkey", version = 1, nFiles = 8)
      Versioned.deleteMor(s, root, "o_orderkey",
        base.filter(col("o_orderkey") % 13 === 0).select("o_orderkey"),
        fromVersion = 1, toVersion = 2)
      Versioned.deleteMor(s, root, "o_orderkey",
        base.filter(col("o_orderkey") % 17 === 0).select("o_orderkey"),
        fromVersion = 2, toVersion = 3)
      Versioned.compact(s, root, "o_orderkey",
        fromVersion = 3, toVersion = 4)
    }
    root
  }

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Symmetrized customer—supplier trade graph (who trades with whom,
    * via orders x lineitem), the shared input of q53 (PageRank) and
    * q55 (BFS). distinct runs on the raw int pair (cheaper hashing
    * than strings); symmetrization is ONE explode pass — the
    * union-of-reversed shape would evaluate the join+distinct pipeline
    * twice. Every node has out-degree >= 1 by construction (q53's
    * no-dangling-mass precondition).
    */
  /** Canonical co-supply edge list (a < b, distinct): suppliers
    * sharing an order, the q58/q66 input. Built as ONE order-keyed
    * groupBy + an in-row pair expansion (two Generates, codegen'd) —
    * the previous distinct + orderkey self-join shape shuffled the
    * (order, supplier) table three times (distinct exchange + both
    * sort-merge-join sides) to produce the same pair set; the groupBy
    * needs one exchange, and the pair fan-out stays bounded by order
    * size exactly as before (guide §2.4: two operations keyed the same
    * way share one exchange). Output set is IDENTICAL: per order, both
    * shapes emit every supplier pair a < b once, and the final
    * distinct collapses cross-order repeats.
    */
  private def coSupplyEdges(s: SparkSession, dir: String): DataFrame = {
    val grouped = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey")
      .groupBy("l_orderkey")
      .agg(collect_set(col("l_suppkey")).as("ss"))
    grouped
      .select(explode(col("ss")).as("a"), col("ss"))
      .select(col("a"), explode(col("ss")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
  }

  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val cn = concat(lit("c"), col("ck"))
    val sn = concat(lit("s"), col("sk"))
    cs.select(explode(array(struct(cn.as("src"), sn.as("dst")),
        struct(sn.as("src"), cn.as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Schema-adaptive events reader. The harness has shipped `ts` both
    * as TIMESTAMP(NANOS) (which Spark's parquet reader rejects as a
    * timestamp — the legacy conf reads it as raw Long nanos) and as
    * native timestamp[us]. Probe WITHOUT the legacy conf first (schema
    * resolution is eager and throws on nanos) and set it only when the
    * file actually needs it — then it must stay live for the lazy scan
    * (intentionally session-global in that legacy case only). Both
    * paths end at the same microsecond TimestampType column DuckDB
    * sees.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw =
      try Tables(s, dir, "events") catch {
        // retry under the conf on ANY failure: a non-nanos error
        // rethrows unchanged
        case _: Exception =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          Tables(s, dir, "events")
      }
    raw.schema("ts").dataType match {
      // exact integer division — `/` on longs is double division, and
      // epoch nanos exceed double's 53-bit exact range (ulp ~256ns)
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // un-adjusted timestamp[us] lands as NTZ, which watermarks and
      // the epoch functions reject; the session tz is pinned to UTC
      // everywhere (Verify/Bench/SparkSpec), so the LTZ cast is
      // wall-clock-identical and matches DuckDB's naive read
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  // J2 flagship — the reference's one true SQL entry point
  // (Method_code.Rmd:763-772): base dim table LEFT JOINed to two
  // aggregate subqueries, rounded projection, deterministic order.
  def reportJoin(s: SparkSession, dir: String): DataFrame = {
    Seq("nation", "region", "customer", "supplier")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql("""
      SELECT n.n_name AS nation,
             r.r_name AS region,
             ROUND(c.cust_bal, 2) AS cust_bal,
             c.cust_cnt AS cust_cnt,
             ROUND(sp.supp_bal, 2) AS supp_bal
      FROM nation n
      JOIN region r ON n.n_regionkey = r.r_regionkey
      LEFT JOIN (SELECT c_nationkey, SUM(c_acctbal) AS cust_bal,
                        COUNT(*) AS cust_cnt
                 FROM customer GROUP BY c_nationkey) c
        ON n.n_nationkey = c.c_nationkey
      LEFT JOIN (SELECT s_nationkey, SUM(s_acctbal) AS supp_bal
                 FROM supplier GROUP BY s_nationkey) sp
        ON n.n_nationkey = sp.s_nationkey
      ORDER BY nation
    """)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_report_join" -> (reportJoin _),

    // A1/A2 — grouped weighted mean (Method_code.Rmd:188-204)
    "q02_weighted_mean" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Relational.weightedMean(li, Seq("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"), scale = 100.0)
        .select(col("l_returnflag"), round(col("wmean"), 6).as("wmean"))
        .orderBy("l_returnflag")
    }),

    // F1 — IN-list filter (Method_code.Rmd:165)
    "q03_filter_in" -> ((s, dir) =>
      t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_21"))
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")),

    // F2 — semi-join by key list (Method_code.Rmd:168): customers in ASIA
    "q04_semi_join" -> ((s, dir) => {
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nationkey"))
      t(s, dir, "customer")
        .join(broadcast(asiaNations), Seq("c_nationkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J1 — chained full outer join (Method_code.Rmd:466-469)
    "q05_fullouter_chain" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
        .agg(avg("c_acctbal").as("cust_avg"))
      val sp = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey"))
        .agg(avg("s_acctbal").as("supp_avg"))
      val n = t(s, dir, "nation")
        .select(col("n_nationkey").as("nationkey"), col("n_name"))
      Relational.fullOuterChain(Seq(c, sp, n), "nationkey")
        .select(col("nationkey"), col("n_name"),
          round(col("cust_avg"), 2).as("cust_avg"),
          round(col("supp_avg"), 2).as("supp_avg"))
        .orderBy("nationkey")
    }),

    // D1 — distinct + sort (Method_code.Rmd:159-160)
    "q06_distinct_sort" -> ((s, dir) =>
      t(s, dir, "orders").select("o_orderstatus").distinct()
        .orderBy("o_orderstatus")),

    // U1 — union of filtered partitions (Method_code.Rmd:179)
    "q07_union" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Relational.unionAll(Seq(
          li.filter(col("l_returnflag") === "R"),
          li.filter(col("l_returnflag") =!= "R")))
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_linestatus")
    }),

    // P2/P3 — one-hot encoding, aggregated (Method_code.Rmd:49-53)
    "q08_onehot" -> ((s, dir) => {
      val levels = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")
      val enc = oneHot(t(s, dir, "orders"), "o_orderpriority", levels, "pr")
      val sums = levels.map { lv =>
        val c = s"pr_${sanitize(lv)}"
        sum(col(c)).as(c)
      }
      enc.groupBy("o_orderstatus").agg(sums.head, sums.tail: _*)
        .orderBy("o_orderstatus")
    }),

    // P8/P9/P14 — logit, linear predictor, sigmoid (Method_code.Rmd:94-140)
    "q09_xbeta" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = (col("l_discount") + lit(0.005)) / lit(0.12)
      val xb = xBeta(0.5, Seq(
        (indicator(col("l_returnflag"), "R").cast("double"), 1.2),
        (indicator(col("l_linestatus"), "F").cast("double"), -0.8),
        (col("l_quantity"), 0.01),
        (logit(p), 2.0)))
      li.select(col("l_orderkey"), col("l_linenumber"),
          round(xb, 6).as("xbeta"),
          round(lit(1.0) / (lit(1.0) + exp(-xb)), 6).as("prob"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A3/M6 — design-based weighted mean + SE (Method_code.Rmd:459-463)
    "q10_design_se" -> ((s, dir) =>
      Survey.weightedMeanSE(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .select(col("l_returnflag"),
          round(col("mean"), 6).as("mean"), round(col("se"), 6).as("se"))
        .orderBy("l_returnflag")),

    // A4 — ASD/RASD/AAD deviation summary (Method_code.Rmd:479-508)
    "q11_deviation" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
        .agg(avg("c_acctbal").as("cust_avg"))
      val sp = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey"))
        .agg(avg("s_acctbal").as("supp_avg"))
      val j = c.join(sp, Seq("nationkey"), "full_outer")
      Relational.deviationSummary(j, col("cust_avg"), col("supp_avg"))
        .select(round(col("asd"), 6).as("asd"),
          round(col("rasd"), 6).as("rasd"), round(col("aad"), 6).as("aad"))
    }),

    // P1 — deterministic row id (Method_code.Rmd:48), via the SCALABLE
    // variant: distributed sort + zipWithIndex offsets, no
    // single-partition window (oracle proves 1..n parity)
    "q12_rowid" -> ((s, dir) =>
      contiguousId(t(s, dir, "orders").select("o_orderkey"),
          Seq("o_orderkey"), "rid")
        .orderBy("o_orderkey")),

    // A12 — group counts + distinct counts (Method_code.Rmd:182,260)
    "q13_counts" -> ((s, dir) =>
      t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          countDistinct("c_mktsegment").as("segs"))
        .orderBy("c_nationkey")),

    // A11/Q3 — product aggregate in log space = geometric mean
    "q14_geomean" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(exp(avg(log(lit(1.0) + col("l_discount")))), 6)
          .as("geo_disc"))
        .orderBy("l_returnflag")),

    // window ranking (beyond reference; §2.8 notes absence — engine adds it)
    "q15_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rn")
    }),

    // event-time tumbling window aggregation (batch form; streaming
    // variant in graft.streaming over the same events table). The events
    // parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    // rejects — read as raw nanos and convert (events() helper).
    "q16_events_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("hour", "event_type")),

    // anti-join: customers with no open ('O') orders
    "q17_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      t(s, dir, "customer")
        .join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    }),

    // TPC-H Q1-shaped pricing summary: multi-aggregate scan with a
    // pushed-down timestamp filter
    "q18_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <=
          lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3 shape (shipping priority): segment-filtered customers x
    // date-filtered orders x late-shipped lineitems, revenue per order,
    // top-10. Both selective filters reach their scans as pushed
    // predicates; the orderkey join shuffles; the top-10 is TakeOrdered
    // over the reduced aggregate, never a global sort. Ranked on the
    // ROUNDED revenue (ties by date, orderkey) so the cut cannot flip
    // on a last-ulp sum divergence between engines.
    "q30_shipping_priority" -> ((s, dir) => {
      val cut = lit("1998-06-01 00:00:00").cast("timestamp")
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_date"), col("l_orderkey"))
        .limit(10)
    }),

    // cohort retention (event analytics): users grouped by first-seen
    // day, retention = distinct users of cohort c active on day c+d.
    // Scale shape: per-user first-day is a map-side-combinable groupBy;
    // the join back shuffles both sides on user_id; the final rollup is
    // a tiny (cohorts x offsets) aggregate. distinct() before the
    // rollup keeps countDistinct's per-group state to one row per
    // (user, cohort, offset) — never the raw event stream.
    "q31_cohort_retention" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val firsts = ev.groupBy("user_id").agg(min("d").as("cohort_d"))
      ev.join(firsts, Seq("user_id"))
        .select(col("user_id"), col("cohort_d"),
          datediff(col("d"), col("cohort_d")).as("day_offset"))
        .distinct()
        .groupBy("cohort_d", "day_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort", "day_offset")
    }),

    // conversion funnel (ClickHouse windowFunnel shape): how many users
    // produce view -> click -> signup -> purchase as a strictly
    // time-ordered subsequence, by sequential-min chaining
    // (Relational.sequentialFunnel) — per-stage state is ONE grouped
    // MIN, never a per-user event buffer, so a bot user with 10^8
    // events can't blow an aggregation buffer (the previous
    // sort_array(collect_list) fold could). The strict ts > prev-ts
    // advance makes equal-timestamp events a non-advance; the oracle
    // compares epoch MICROSECONDS (q19's trick) so its "equal" matches
    // the engine's nanos->micros truncated timestamps from events().
    "q32_funnel" -> ((s, dir) => {
      val stages = Seq("view", "click", "signup", "purchase")
      val stageArr = array(stages.map(lit): _*)
      // a 2-day slice (~5 events/user at sf0.01) keeps the stage
      // counts discriminating — over the full month every user
      // completes all four stages and the funnel degenerates. Cached:
      // the stage chain scans it 4x.
      val slice = events(s, dir)
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
        .select("user_id", "ts", "event_type")
        .cache()
      graft.rel.Relational
        .sequentialFunnel(slice, "user_id", "ts", "event_type", stages)
        .select(col("stage_idx"),
          element_at(stageArr, col("stage_idx")).as("stage"),
          col("n_users"))
        .orderBy("stage_idx")
    }),

    // J5 (beyond-reference) — as-of join: every click event enriched
    // with the user's most recent purchase value at-or-before it.
    // Union + single key shuffle + running window — no range-join
    // explosion (see Relational.asofJoin).
    "q19_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      graft.rel.Relational
        .asofJoin(clicks, purchases, "user_id", "ts", col("value"),
          as = "prev_purchase")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("click_value"),
          round(col("prev_purchase"), 4).as("prev_purchase"))
        .orderBy("event_id")
    }),

    // S2/S3 — CSV sink + source round-trip (Method_code.Rmd:473,
    // 752-753 persist report/bootstrap matrices as CSV): write the
    // joined nation dim as headered CSV, read it back with an explicit
    // schema, and hash-compare against the parquet truth — proves the
    // CSV writer/reader preserve values, not just that they run.
    "q20_csv_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        graft.TempDirs.createCleanedAtExit("graft-q20-csv"))
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey").cast("int"), col("n_name"),
          col("n_regionkey").cast("int"))
      graft.sources.Csv.write(nation, out.toString, singleFile = true)
      graft.sources.Csv.read(s, out.toString, nation.schema)
        .orderBy("n_nationkey")
    }),

    // beyond-reference preference query: skyline of parts — cheapest
    // price vs largest size Pareto front, two-phase local-prune plan
    // (no shuffle until the pruned survivors)
    "q21_skyline" -> ((s, dir) =>
      graft.ops.Skyline.skyline(
          t(s, dir, "part")
            .select("p_partkey", "p_size", "p_retailprice"),
          minCols = Seq("p_retailprice"), maxCols = Seq("p_size"))
        .select(col("p_partkey"), col("p_size"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
        .orderBy("p_partkey")),

    // OLAP rollup: subtotal hierarchy over (returnflag, linestatus) in
    // one pass — Catalyst expands grouping sets without rescanning
    "q22_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // grouping sets: two independent aggregation grains in one pass
    // (by returnflag, by linestatus) — unlike rollup's nested grains;
    // GROUPING() disambiguates the nulls so real null keys could never
    // collide with the subtotal rows. Spark expands to one shuffle
    // with an Expand node (each row feeds every set's partial agg) —
    // no second scan of the fact table for the second grain.
    "q37_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_gsets")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        FROM li_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY g_flag, g_status,
                 l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
      """)
    }),

    // per-user event-stream analytics: sequence index, inter-event gap
    // and a 3-row moving average in ONE user-keyed shuffle (windows
    // partitioned by user_id — parallel per-user sorts, never global).
    // The gap is exact integer microseconds (unix_micros both engines);
    // floats only in the rounded moving average.
    "q38_window_analytics" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wAvg = w.rowsBetween(-2, Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("seq", row_number().over(w))
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("mavg3", round(avg(col("value")).over(wAvg), 4))
        .select("user_id", "event_id", "seq", "gap_us", "mavg3")
        .orderBy("user_id", "seq")
    }),

    // correlated scalar subquery (TPC-H Q17 shape): lineitems whose
    // quantity is below 20% of their part's average. Written as the
    // genuinely correlated form — Catalyst decorrelates it into a
    // per-part aggregate joined back on l_partkey (asserted in
    // PlanSpec: no nested-loop re-execution per outer row, which is
    // the difference between O(n) and O(n²) at 100 TB). The threshold
    // compare is float-exact across engines: l_quantity is
    // integer-valued, so the per-part sum is exact in a double
    // regardless of combine order and AVG is the same division in
    // both engines.
    "q39_avg_qty_subquery" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q39")
      t(s, dir, "part").createOrReplaceTempView("part_q39")
      s.sql("""
        SELECT p.p_brand,
               COUNT(*) AS n_small,
               ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM li_q39 l JOIN part_q39 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM li_q39 l2
                              WHERE l2.l_partkey = p.p_partkey)
        GROUP BY p.p_brand
        ORDER BY p.p_brand
      """)
    }),

    // spatial point-in-polygon join (beyond ref): geo-tag a
    // deterministic CONUS point grid (dyadic-safe: integer-keyed
    // coordinates built double-for-double the same way in both
    // engines) to the embedded UsGeo state polygons via the even-odd
    // crossing test as a pure Column HOF over the BROADCAST polygon
    // table — bbox prefilter, no UDF, no geometry library, points
    // never shuffle until the final dimension-sized rollup (see
    // ops.Spatial). Oracle replays the identical crossing arithmetic
    // from the identical generated edge table.
    "q72_spatial_join" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey").as("id"),
        (lit(-125.0) + pmod(col("c_custkey") * 7, lit(560))
          .cast("double") / 10.0).as("lon"),
        (lit(25.0) + pmod(col("c_custkey") * 13, lit(240))
          .cast("double") / 10.0).as("lat"))
      graft.ops.Spatial.pointInStateJoin(pts, "id", "lon", "lat")
        .groupBy("state")
        .agg(count(lit(1)).as("n_points"), sum("id").as("id_sum"))
        .orderBy("state")
    }),

    // table diff / reconciliation (beyond ref): the migration-audit
    // primitive — a synthetic next-day snapshot (every 97th key
    // deleted, every 11th repriced, every 13th cloned under a new
    // key) diffed against the current one by Relational.tableDiff's
    // single full-outer key join, then rolled up per status. The
    // changed/unchanged verdicts compare values WITHIN one engine, so
    // round()-mode differences between engines can't leak into the
    // classification; key_sum is an exact integer checksum.
    // versioned copy-on-write time travel (Versioned: the miniature
    // Delta/Iceberg commit model over mergeUpsert) — shared fixture
    // for q73/q74/st13: v1 = the orders
    // snapshot range-split into 8 immutable files, v2 = a MERGE commit
    // (updates %31 -> status 'X' +10% price, deletes %37, inserts
    // %41 into net-new key space) that rewrites ONLY the files whose
    // key range the batch touches. Both snapshots then read back
    // through their manifests — the oracle replays both versions'
    // CONTENT from the raw table; the COW file-reuse property is
    // VersionedSpec-gated.
    "q73_time_travel" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = timeTravelRoot(s, dir)
      def snap(v: Int) =
        Versioned.readAsOf(s, root, v)
          .agg(count(lit(1)).as("n_rows"),
            round(sum("o_totalprice"), 2).as("total"))
          .select(lit(v).as("version"), col("n_rows"), col("total"))
      snap(1).unionByName(snap(2)).orderBy("version")
    }),

    // manifest-level data skipping on the same versioned table: a
    // key-range read of v2 consults the file-count-sized manifest
    // FIRST (files whose [min_key, max_key] miss the range are never
    // opened — the key-range analog of partition pruning), then the
    // residual predicate pushes to the surviving parquet scans.
    // Pruning mechanics are VersionedSpec-gated; the oracle replays
    // the v2 content with the same WHERE.
    "q74_snapshot_prune" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = timeTravelRoot(s, dir)
      Versioned.readAsOfWhere(s, root, version = 2, "o_orderkey",
          lo = 1000L, hi = 3000L)
        .agg(count(lit(1)).as("n_rows"),
          round(sum("o_totalprice"), 2).as("total"),
          min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
    }),

    // add-column schema evolution through the versioned lakehouse
    // path: v2's change batch introduced `o_tier`; reading v2 merges
    // post-evolution files (tier populated) with untouched
    // pre-evolution files (tier = null) — grouped here by tier label.
    // Sums ride EXACT integer cents (floor(p*100+0.5)), so no float
    // combine-order can flip a digit. The oracle replays v2's CONTENT
    // from the raw table; the file-reuse/old-schema mechanics are
    // VersionedSpec-gated.
    "q85_schema_evolution" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = schemaEvoRoot(s, dir)
      Versioned.readAsOf(s, root, 2)
        .groupBy(coalesce(col("o_tier"), lit("none")).as("tier"))
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents"),
          min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
        .orderBy("tier")
    }),

    // merge-on-read deletes: v2/v3 are tombstone-only commits (zero
    // data files rewritten — the write-cheap half of COW/MOR), v4 is
    // the compaction that folds them in. All four snapshots read back
    // identically cheap for the caller; v3 == v4 content is the
    // compaction-preserves-content property, visible here as equal
    // rows. Oracle replays each version's content from the raw table.
    "q86_mor_deletes" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = morRoot(s, dir)
      def snap(v: Int) =
        Versioned.readAsOf(s, root, v)
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
              .as("cents"))
          .select(lit(v).as("version"), col("n_rows"), col("cents"))
      snap(1).unionByName(snap(2)).unionByName(snap(3))
        .unionByName(snap(4)).orderBy("version")
    }),

    // change data feed over the COW merge commit, computed after the
    // fact from the two manifests (no change log stored): updates emit
    // a pre/post image pair, rewritten-but-carried rows vanish via the
    // null-safe struct diff, carried-verbatim files are never scanned
    // (PlanSpec-gated). The oracle replays the change batch's effect
    // per change type from the raw table.
    "q87_change_feed" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = timeTravelRoot(s, dir)
      Versioned.changeFeed(s, root, "o_orderkey", 1, 2)
        .groupBy("_change_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents"),
          min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
        .orderBy("_change_type")
    }),

    // change data feed across the MOR lifecycle (tombstone commits +
    // compaction), per commit: v2/v3 emit pure deletes — the second
    // tombstone commit's feed EXCLUDES keys already dead at v2 — and
    // the compaction commit v4 diffs to ZERO rows (content-preserving
    // by construction), so no _commit_version=4 group exists.
    "q88_cdf_mor" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = morRoot(s, dir)
      Versioned.changeFeed(s, root, "o_orderkey", 1, 4)
        .groupBy("_commit_version", "_change_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents"),
          min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
        .orderBy("_commit_version", "_change_type")
    }),

    // incremental materialized-view maintenance off the change feed —
    // the reason CDF exists at 100 TB: the status-grouped aggregate at
    // v1 is refreshed to v2 by applying SIGNED deltas from the
    // commit-sized feed (insert/update_postimage +1, delete/
    // update_preimage -1; updates move rows between groups naturally
    // as a -1 in the old group and +1 in the new), never re-scanning
    // the table. The oracle recomputes v2's aggregate DIRECTLY from
    // the replayed content — equality proves the delta algebra.
    "q89_incremental_mv" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = timeTravelRoot(s, dir)
      def cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val mv1 = Versioned.readAsOf(s, root, 1)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n0"), sum(cents).as("c0"))
      val sign = when(col("_change_type")
        .isin("insert", "update_postimage"), 1L).otherwise(-1L)
      val delta = Versioned.changeFeed(s, root, "o_orderkey", 1, 2)
        .groupBy("o_orderstatus")
        .agg(sum(sign).as("dn"), sum(sign * cents).as("dc"))
      mv1.join(delta, Seq("o_orderstatus"), "full_outer")
        .select(col("o_orderstatus"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("c0"), lit(0L)) + coalesce(col("dc"), lit(0L)))
            .as("cents"))
        .filter(col("n_rows") > 0)
        .orderBy("o_orderstatus")
    }),

    // timestamp-based time travel (the Delta `timestampAsOf` surface
    // over the same commit model): each manifest carries its commit
    // wall-clock in-commit (`_commit_ts`, atomic with the rename);
    // resolution = latest version committed at or before the asked
    // instant, inclusive at the boundary. Timestamps here are PINNED
    // via the fixture hook so the oracle replays resolution
    // deterministically (v1@1e6 ms, v2@2e6 ms): ts=1.5e6 → v1,
    // ts=2e6 (boundary) → v2, ts=9e6 → v2. Pre-oldest asks error —
    // spec-gated, as is expire interaction.
    // Delta-style RESTORE (metadata-only rollback): v1 -> bad v2 ->
    // restore(1) commits v3 whose manifest re-references v1's file
    // group verbatim. v3's content must equal v1's EXACTLY while v2
    // stays readable for audit — the oracle replays all three
    // snapshots (v3's rows are v1's with version = 3). Own fixture
    // root (NOT timeTravelRoot: restore appends a version, and the
    // shared root must stay two-version for q73/q87/q90); built once
    // per JVM, guarded on hasVersion(root, 3) so re-runs are
    // deterministic. Expire interaction is VersionedSpec-gated.
    "q91_restore" -> ((s, dir) => {
      import graft.sources.Versioned
      val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
      val root = new java.io.File(
        graft.TempDirs.scratchRoot, s"graft-q91-$key")
        .getAbsolutePath
      val base = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      if (!Versioned.hasVersion(root, 3)) {
        graft.TempDirs.registerCleanedAtExit(root)
        if (!Versioned.hasVersion(root, 1))
          Versioned.write(base, root, "o_orderkey", version = 1,
            nFiles = 8)
        if (!Versioned.hasVersion(root, 2))
          Versioned.merge(s, root, "o_orderkey", "op",
            timeTravelChanges(base), fromVersion = 1, toVersion = 2)
        Versioned.restore(s, root, 1)
      }
      def snap(v: Int) =
        Versioned.readAsOf(s, root, v)
          .agg(count(lit(1)).as("n_rows"),
            round(sum("o_totalprice"), 2).as("total"))
          .select(lit(v).as("version"), col("n_rows"), col("total"))
      snap(1).unionByName(snap(2)).unionByName(snap(3))
        .orderBy("version")
    }),

    // data-quality EXPECTATIONS on the commit path (the DLT
    // expect_or_drop shape): a batch with planted violations commits
    // through Versioned.writeWithExpectations — violators quarantined
    // per constraint (a row failing two gates is attributed to both),
    // clean rows committed, and the returned metrics (per-constraint
    // violation counts + committed count) are the entry's output. The
    // oracle replays the split; quarantine content and snapshot
    // cleanliness are VersionedSpec-gated. NULL passes (SQL CHECK).
    "q92_expectations" -> ((s, dir) => {
      import graft.sources.Versioned
      val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
      val root = new java.io.File(
        graft.TempDirs.scratchRoot, s"graft-q92-$key")
        .getAbsolutePath
      graft.TempDirs.registerCleanedAtExit(root)
      // planted corruption: %43 keys get a negated price, %47 keys an
      // unknown status (keys hitting both violate both constraints)
      val batch = t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 47 === 0, "Z")
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("o_orderkey") % 43 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      Versioned.writeWithExpectations(batch, root, "o_orderkey",
        version = 1, nFiles = 8, expectations = Seq(
          "price_nonneg" -> (col("o_totalprice") >= 0),
          "status_known" -> col("o_orderstatus").isin("O", "F", "P")))
        .orderBy("expectation")
    }),

    "q90_timestamp_travel" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = timeTravelRoot(s, dir)
      Versioned.setCommitTimestamp(root, 1, 1000000L)
      Versioned.setCommitTimestamp(root, 2, 2000000L)
      def at(ts: Int) = {
        val v = Versioned.versionAtTimestamp(root, ts.toLong)
        Versioned.readAsOf(s, root, v)
          .agg(count(lit(1)).as("n_rows"),
            round(sum("o_totalprice"), 2).as("total"))
          .select(lit(ts).as("ts_ms"), lit(v).as("version"),
            col("n_rows"), col("total"))
      }
      at(1500000).unionByName(at(2000000)).unionByName(at(9000000))
        .orderBy("ts_ms")
    }),

    // pipeline observability: Dataset.observe attaches data-quality
    // metrics (row count, null count, running mean) to the SAME pass
    // as the real aggregation — zero extra scans, the Spark-native
    // replacement for a separate profiling job. At 100 TB a second
    // "count the nulls" pass over the fact table is the difference
    // between one scan and two; observe rides the existing one as an
    // AggregatingAccumulator. The oracle recomputes the metrics
    // declaratively.
    "q75_observed_metrics" -> ((s, dir) => {
      import org.apache.spark.sql.Observation
      val li = t(s, dir, "lineitem")
      val obs = Observation()
      val observed = li.observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L))
          .as("null_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"))
      // the real work: per-flag pricing aggregate; its action is what
      // populates the observation
      val nGroups = observed.groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q")).count()
      val m = obs.get
      import s.implicits._
      Seq((m("rows_seen").asInstanceOf[Long],
        m("null_qty").asInstanceOf[Long],
        m("avg_price").asInstanceOf[Double], nGroups))
        .toDF("rows_seen", "null_qty", "avg_price", "n_groups")
    }),

    "q71_table_diff" -> ((s, dir) => {
      val cur = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val nxt = cur.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 11 === 0,
            round(col("o_totalprice") + 1.0, 2))
            .otherwise(col("o_totalprice")))
        .unionByName(cur.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus")))
      Relational.tableDiff(cur, nxt, Seq("o_orderkey"),
          Seq("o_totalprice", "o_orderstatus"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
        .orderBy("status")
    }),

    // cost-based optimization (beyond ref): catalog statistics
    // (ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS]) feeding
    // Catalyst's CBO — cardinality-aware plan costing and
    // CostBasedJoinReorder. The query is written with a deliberately
    // bad syntactic order (the two big tables first, the selective
    // dim last); with row counts + NDVs in the catalog the optimizer
    // is free to re-order the join graph by estimated cardinality —
    // at 100 TB the difference between shuffling the raw fact×fact
    // intermediate and the dim-pruned slice. Stats live in the
    // session catalog (shared), data in exit-cleaned external paths;
    // CBO confs scoped to a cloned session (Compact's pattern).
    // PlanSpec asserts the ANALYZE stats are actually visible to the
    // optimizer (rowCount propagated, not file-size guesses).
    "q70_cbo_reorder" -> ((s, dir) => {
      val cb = s.newSession()
      cb.conf.set("spark.sql.cbo.enabled", "true")
      cb.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // table names are sfDir-keyed: Verify (sf0.01) and Bench (sf0.1)
      // share one JVM/catalog, and a cached wrong-SF table would
      // silently serve stale data
      val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
      def tbl(n: String) = s"graft_cbo_${n}_$key"
      // build-once keyed on the Fixtures MEMO, not bare
      // catalog.tableExists: the catalog registration outlives the
      // bench's cold-start fixture sweep (which removes the backing
      // graft-q70-* dirs and clears memos but cannot drop session
      // catalog tables), so the exists-check alone let a load-gated
      // rerun serve WARM — q70's sf0.1 "median" read 0.08 s against
      // a 4.9 s true cold build (caught by the round-13 sf10 sweep's
      // 128x pseudo-factor). The memo resets with coldReset; a
      // rebuild drops the stale catalog entry first.
      Seq("lineitem", "orders", "part").foreach { n =>
        if (!cboBuilt.containsKey(tbl(n))) {
          cb.sql(s"DROP TABLE IF EXISTS ${tbl(n)}")
          val out = graft.TempDirs.createCleanedAtExit(s"graft-q70-$n")
          t(cb, dir, n).write.mode("overwrite")
            .option("path", out).saveAsTable(tbl(n))
          cb.sql(s"ANALYZE TABLE ${tbl(n)} COMPUTE STATISTICS")
          if (n == "part")
            cb.sql(s"ANALYZE TABLE ${tbl(n)} COMPUTE STATISTICS " +
              "FOR COLUMNS p_partkey, p_size")
          cboBuilt.put(tbl(n), out)
        }
      }
      cb.sql(s"""
        SELECT p.p_brand, COUNT(*) AS n_items,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                 AS revenue
        FROM ${tbl("lineitem")} l
        JOIN ${tbl("orders")} o ON l.l_orderkey = o.o_orderkey
        JOIN ${tbl("part")} p ON l.l_partkey = p.p_partkey
        WHERE p.p_size = 2 AND o.o_orderstatus = 'F'
        GROUP BY p.p_brand ORDER BY p.p_brand
      """)
    }),

    // TPC-H Q21 shape — the correlated EXISTS + NOT EXISTS pair,
    // written in its genuinely-correlated form: suppliers whose
    // returned line sits in a multi-supplier order where NO other
    // supplier had a return. Catalyst decorrelates BOTH subqueries
    // (RewritePredicateSubquery) into one left-SEMI and one left-ANTI
    // hash join on l_orderkey — at 100 TB each correlated probe is a
    // key-partitioned join pass, never a per-row re-scan of lineitem
    // (the O(n) vs O(n²) gap q39 demonstrates for scalar subqueries).
    // PlanSpec asserts the semi+anti pair with no nested loop.
    "q69_exists_pair" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q69")
      s.sql("""
        SELECT l1.l_suppkey,
               COUNT(*) AS n_sole_fault,
               ROUND(SUM(l1.l_extendedprice), 2) AS exposure
        FROM li_q69 l1
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM li_q69 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li_q69 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY l1.l_suppkey
        HAVING COUNT(*) >= 3
        ORDER BY l1.l_suppkey
      """)
    }),

    // time-spine gap fill + forward fill (resampling): per-user daily
    // purchase totals on a contiguous day spine from each user's first
    // to last active day, gaps carried forward with last(ignoreNulls).
    // Spine = explode(sequence(d0, d1)) — generated per user on
    // executors, never a driver-side calendar; rows = users × span
    // days, linear in users. Fill = ONE user-keyed window (local
    // per-user sorts). Day is compared as a formatted string so
    // engine DATE representations can't diverge.
    "q40_gap_fill" -> ((s, dir) => {
      val daily = events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(sum("value"), 4).as("day_value"))
        .cache() // fans into the span branch and the spine join
      val spine = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled", last(col("day_value"), ignoreNulls = true).over(w))
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("filled"),
          col("day_value").isNull.as("is_gap"))
        .orderBy("user_id", "day")
    }),

    // linear time-series interpolation — the value-aware companion to
    // q40's forward fill: missing days get the straight line between
    // the nearest known days (prev/next found via IGNORE-NULLS
    // windows). Both directions share the user-keyed sort, so the
    // whole query is ONE shuffle + one Window operator; the spine
    // spans each user's [min, max] known day, so interior gaps always
    // have both endpoints. The daily statistic is MAX — exactly
    // combine-order-invariant, unlike sum/avg whose last-ulp float
    // drift across engines flips ROUND at .00005 boundaries — so the
    // cross-engine interpolation arithmetic starts from identical
    // doubles.
    "q60_interpolate" -> ((s, dir) => {
      val daily = events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(max("value"), 4).as("y"))
        .cache() // fans into the spine build and the join
      val spine = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val wb = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("py", last(col("y"), ignoreNulls = true).over(wb))
        .withColumn("pd", last(when(col("y").isNotNull, col("day")),
          ignoreNulls = true).over(wb))
        .withColumn("ny", first(col("y"), ignoreNulls = true).over(wf))
        .withColumn("nd", first(when(col("y").isNotNull, col("day")),
          ignoreNulls = true).over(wf))
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          // UNROUNDED on purpose: the inputs are bit-identical across
          // engines (rounded MAX) and +,-,*,/ are IEEE-exact in both,
          // so the raw doubles hash-match — while rounding would
          // CREATE divergence (4-decimal endpoints x dyadic day
          // fractions produce exact .xxxx5 midpoints, where Spark's
          // BigDecimal HALF_UP and DuckDB's multiply-rint disagree)
          when(col("y").isNotNull, col("y"))
            .otherwise(col("py") + (col("ny") - col("py"))
              * (datediff(col("day"), col("pd")).cast("double")
                 / datediff(col("nd"), col("pd")).cast("double")))
            .as("y_interp"),
          col("y").isNull.as("is_interp"))
        .orderBy("user_id", "day")
    }),

    // percent_rank over per-segment balances WITHOUT the per-segment
    // window sort (Relational.scalableRank: compact value-distribution
    // running sum + tie-group row_number — the q61 twin of d35's
    // distributed ntile); (rank-1)/(n-1) in exact integers-cast-double
    // hash-matches DuckDB's NATIVE percent_rank ordered by (bal, id)
    "q61_percent_rank" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(col("c_custkey"),
        col("c_mktsegment").as("seg"), round(col("c_acctbal"), 2).as("bal"))
      Relational.scalableRank(base, "seg", "bal", "c_custkey")
        .select(col("c_custkey"), col("seg"), col("bal"),
          when(col("n_group") === 1, lit(0.0))
            .otherwise((col("rank") - 1).cast("double")
              / (col("n_group") - 1).cast("double")).as("pr"))
        .orderBy("c_custkey")
    }),

    // set operations beyond union (q07): INTERSECT / EXCEPT with
    // distinct-set semantics over day-1 purchaser vs day-1 error-er
    // user sets (day 1 so both differences are non-empty at every SF).
    // Catalyst plans these as left-semi / left-anti hash joins over
    // the deduplicated sides — no sort-based set algebra, and the
    // day-1 filter is pushed below the distinct so the shuffled sets
    // are day-sized, not corpus-sized.
    "q41_setops" -> ((s, dir) => {
      val day1 = events(s, dir)
        .filter(to_date(col("ts")) === lit("2024-01-01").cast("date"))
        .select("user_id", "event_type")
        .cache() // both sides of all three set ops read it
      val purch = day1.filter(col("event_type") === "purchase")
        .select("user_id").distinct()
      val errs = day1.filter(col("event_type") === "error")
        .select("user_id").distinct()
      purch.intersect(errs).withColumn("side", lit("both"))
        .unionByName(purch.except(errs)
          .withColumn("side", lit("purchase_only")))
        .unionByName(errs.except(purch)
          .withColumn("side", lit("error_only")))
        .orderBy("user_id", "side")
    }),

    // sliding event-time windows (1h window, 15min slide): each event
    // feeds window/slide = 4 overlapping windows. Spark expands the
    // windows with a Generate (executor-side, narrow) then aggregates
    // — one shuffle on (window, type), partial aggregation applies.
    // The oracle replays the same epoch-aligned window enumeration
    // arithmetically. Window starts are exact integer microseconds.
    "q42_sliding_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")),

    // mergeable distinct-count sketches (DataSketches HLL): per-day
    // sketches of the active-user set, rolled up to a month total by
    // sketch UNION — the 100 TB distinct-count pattern: daily partials
    // persist as ~KB binaries, any rollup window is a cheap merge of
    // stored sketches, never a re-scan of the raw events. Sketch
    // binaries are engine-specific, so no SQL oracle (rows-only);
    // estimate error and merge associativity are spec-gated
    // (SketchSpec), and exact counts ride along for visibility.
    "q43_approx_distinct" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val daily = ev.groupBy("day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          countDistinct(col("user_id")).as("exact_users"))
        .cache() // fans into the per-day rows and the month rollup
      val monthEst = daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val monthExact = ev.agg(countDistinct(col("user_id")).as("exact"))
      daily.select(date_format(col("day"), "yyyy-MM-dd").as("scope"),
          hll_sketch_estimate(col("sk")).cast("long").as("est_users"),
          col("exact_users"))
        .unionByName(monthEst.crossJoin(monthExact)
          .select(lit("month_total").as("scope"),
            col("est").cast("long").as("est_users"),
            col("exact").as("exact_users")))
        .orderBy("scope")
    }),

    // CUBE: all four grains of (returnflag, linestatus) in ONE Expand
    // pass — completes the grouping family (rollup q22 = nested
    // grains, grouping sets q37 = chosen grains, cube = the lattice).
    // GROUPING() bits disambiguate subtotal nulls from real nulls,
    // exactly as in q37.
    "q44_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping("l_returnflag").as("g_flag"),
          grouping("l_linestatus").as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // single-pass approximate percentiles (GK sketch) — the companion
    // to q24's exact two-pass operator: at 100 TB the sketch is the
    // default (one pass, mergeable partials, bounded memory) and the
    // exact op is reserved for audited reports. Sketch internals are
    // engine-specific — rows-only; SketchSpec gates the rank error
    // against the exact CDF.
    "q45_approx_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
          .as("ps"))
        .select(col("l_returnflag"),
          round(col("ps")(0), 4).as("p25"),
          round(col("ps")(1), 4).as("p50"),
          round(col("ps")(2), 4).as("p75"))
        .orderBy("l_returnflag")),

    // dirty-ingest audit: a JSON drop with 3 malformed lines read in
    // PERMISSIVE mode with a corrupt-record column — one bad line
    // neither kills the 100 TB ingest (FAILFAST would) nor silently
    // vanishes (default PERMISSIVE without the column would): every
    // line is accounted valid or corrupt, and the valid side must
    // aggregate to the parquet truth.
    "q46_corrupt_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val out = graft.TempDirs.createCleanedAtExit("graft-q46-json")
      val valid = t(s, dir, "nation")
        .select(to_json(struct(col("n_nationkey"), col("n_name"),
          col("n_regionkey"))).as("value"))
      import s.implicits._
      val corrupt = Seq("{", "not json at all", "{\"n_nationkey\":")
        .toDF("value")
      valid.unionByName(corrupt).coalesce(1)
        .write.mode("overwrite").text(out)
      val schema = new StructType()
        .add("n_nationkey", LongType).add("n_name", StringType)
        .add("n_regionkey", LongType)
      graft.sources.JsonLines.readAudit(s, out, schema)
        .withColumn("status",
          when(col("_corrupt_record").isNull, "valid")
            .otherwise("corrupt"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum("n_nationkey").as("sum_key"))
        .orderBy("status")
    }),

    // batch MERGE/upsert: apply a deterministic change batch (updates
    // where key%13=0, deletes where key%17=0 — delete wins on overlap
    // — inserts keyed key+10M where key%19=0) to the orders snapshot
    // in ONE full-outer shuffle join — the relational core of
    // Delta/Iceberg MERGE INTO on plain parquet
    "q47_merge_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val changes = orders
        .filter(col("o_orderkey") % 13 === 0 || col("o_orderkey") % 17 === 0)
        // floor-based 2dp rounding, not round(): the 10% bump lands on
        // .xx5 halfway points where Spark (decimal-string HALF_UP) and
        // DuckDB (binary) disagree; floor(x*100+0.5)/100 is pure IEEE
        // arithmetic, identical everywhere
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (floor(col("o_totalprice") * 1.1 * 100 + 0.5) / 100)
            .as("o_totalprice"),
          when(col("o_orderkey") % 17 === 0, "D").otherwise("U").as("op"))
        .unionByName(orders.filter(col("o_orderkey") % 19 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
            lit("U").as("op")))
      Relational.mergeUpsert(orders, changes, "o_orderkey", "op")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // SCD2 dimension build: collapse each user's event-type feed into
    // validity intervals (one row per run of consecutive identical
    // values) — one shuffle on the key, lag/lead windows share one
    // sort. Equal-ts observations are pre-aggregated away (the feed
    // contract); timestamps formatted at microsecond precision on
    // both engines.
    "q48_scd2" -> ((s, dir) => {
      val feed = events(s, dir)
        .groupBy(col("user_id"), col("ts"))
        .agg(min("event_type").as("event_type"))
      Relational.scd2(feed, "user_id", "ts", Seq("event_type"))
        .select(col("user_id"), col("version"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("valid_to"),
          col("is_current"))
        .orderBy("user_id", "version")
    }),

    // unpivot/melt: wide per-flag metrics to long (metric, value)
    // rows — Spark's native unpivot is a narrow Expand (rows ×
    // n_metrics executor-side), never a shuffle
    "q49_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 4).as("avg_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")),

    // semi-structured extraction: the events' JSON props column parsed
    // with a declared schema via from_json — a typed, codegen'd narrow
    // projection (NOT per-field get_json_object re-parsing, which
    // re-tokenizes the document once per extracted field), then a
    // plain typed aggregation. The 100 TB shape for "JSON lake with a
    // known-enough schema".
    "q50_json_extract" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructType}
      events(s, dir)
        .select(col("event_type"),
          from_json(col("props"), new StructType().add("k", LongType))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    }),

    // semi-structured VARIANT path (Spark 4's schema-on-read binary
    // JSON encoding — the engine-native alternative to q50's
    // declared-schema from_json): parse once into VariantType, then
    // typed path extraction with variant_get; a missing path is null,
    // not an error, so ragged payloads survive. At 100 TB variant
    // columns shred/prune like any other binary column and the parse
    // is a narrow codegen'd map over the scan.
    "q76_variant_extract" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          parse_json(col("props")).as("v"))
        .select(col("event_type"),
          variant_get(col("v"), "$.k", "bigint").as("k"),
          variant_get(col("v"), "$.missing", "string").as("miss"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          max("k").as("max_k"),
          sum(when(col("miss").isNull, 1L).otherwise(0L))
            .as("n_missing"))
        .orderBy("event_type")),

    // point-in-time dimension join (temporal correctness — the
    // feature-store / portfolio "what did the dimension say AT event
    // time" join): probes land on the q48 SCD2 history through the
    // as-of machinery — contiguous validity intervals mean "latest
    // valid_from <= ts" IS the interval containing ts, so the range
    // join collapses to one keyed union + one windowed carry-forward
    // (no interval explosion, no BNLJ). Probes before a user's first
    // version drop, matching the oracle's inner interval join.
    "q77_pit_join" -> ((s, dir) => {
      val feed = events(s, dir)
        .groupBy(col("user_id"), col("ts"))
        .agg(min("event_type").as("event_type"))
      val dim = Relational.scd2(feed, "user_id", "ts",
        Seq("event_type"))
      val probes = events(s, dir)
        .filter(col("event_id") % 7 === 0)
        .select(col("user_id"),
          (col("ts") + expr("INTERVAL 90 MINUTES")).as("ts"),
          col("event_id"))
      val dimR = dim.select(col("user_id"),
        col("valid_from").as("ts"), col("event_type"))
      Relational.asofJoin(probes, dimR, "user_id", "ts",
          col("event_type"), as = "status_at")
        .filter(col("status_at").isNotNull)
        .groupBy("status_at")
        .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"))
        .orderBy("status_at")
    }),

    // exact money arithmetic through DecimalType: doubles cast to
    // decimal at the scan, every product/sum EXACT from there (no
    // float association-order anywhere — the result is the same
    // number on any partitioning, any engine), cast back to double
    // only at the edge. The 100-TB relevance: financial aggregates
    // must not drift with shuffle topology, and decimal sums are the
    // Spark-native way to guarantee it.
    "q78_decimal_totals" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_extendedprice").cast("decimal(18,2)").as("p"),
          col("l_discount").cast("decimal(18,4)").as("d"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("p").cast("double").as("sum_price"),
          sum(col("p") * (lit(1).cast("decimal(18,2)") - col("d")))
            .cast("double").as("sum_disc_price"))
        .orderBy("l_returnflag")),

    // recursive CTE (Spark 4's WITH RECURSIVE — iteration INSIDE one
    // SQL statement, no driver loop): every customer walks the
    // implicit binary-tree hierarchy k -> k/2 to the root; output is
    // the depth histogram. The engine plans each recursion step as a
    // distributed join/union round — the declarative counterpart of
    // ops/Graph's hand-rolled BFS (q55), here left entirely to the
    // engine. DuckDB replays the identical recursion.
    "q79_recursive_cte" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("cust_q79")
      s.sql("""
        WITH RECURSIVE anc(k, cur, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM cust_q79
          WHERE c_custkey <= 200
          UNION ALL
          SELECT k, cur DIV 2, depth + 1 FROM anc WHERE cur > 1)
        SELECT depth, COUNT(*) AS n FROM anc WHERE cur = 1
        GROUP BY depth ORDER BY depth""")
    }),

    // correlated LATERAL subquery (Spark 4 lateral join): per-nation
    // top-2 suppliers written as the SQL-standard LATERAL ... LIMIT —
    // Catalyst decorrelates it into the same per-group-top-k plan
    // family as q67's window/aggregate forms; the point is the SQL
    // surface, checked against DuckDB's native LATERAL.
    "q80_lateral_topk" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation_q80")
      t(s, dir, "supplier").createOrReplaceTempView("supp_q80")
      s.sql("""
        SELECT n.n_name, s.s_suppkey, s.bal
        FROM nation_q80 n, LATERAL (
          SELECT s_suppkey, ROUND(s_acctbal, 2) AS bal FROM supp_q80
          WHERE s_nationkey = n.n_nationkey
          ORDER BY ROUND(s_acctbal, 2) DESC, s_suppkey LIMIT 2) s
        ORDER BY n.n_name, bal DESC, s_suppkey""")
    }),

    // null-key skew split (the q25 salting pattern's sibling): in a
    // LEFT join, null keys can never match but a naive plan still
    // shuffles them — and they all hash to ONE reducer, the classic
    // silent straggler when an optional foreign key is mostly null.
    // Split nulls out BEFORE the exchange (they pass through with
    // null dim columns), join only real keys, union after — same
    // result as the plain left join (the oracle), none of the hot
    // partition. PlanSpec asserts the join input is null-filtered.
    "q81_null_skew_join" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("value"),
        when(col("event_id") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("user_id")).as("k"))
      val dim = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val matched = ev.filter(col("k").isNotNull)
        .join(dim, col("k") === col("c_custkey"), "left")
        .drop("c_custkey")
      val nulls = ev.filter(col("k").isNull)
        .withColumn("segment", lit(null).cast("string"))
      matched.unionByName(nulls)
        .groupBy(coalesce(col("segment"), lit("NONE")).as("segment"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("segment")
    }),

    // table profiler — the first query every pipeline runs against an
    // unknown table: per-column row/null/distinct counts and min/max,
    // all in ONE scan (a single wide aggregate reshaped to long form
    // executor-side; four separate per-column scans is the naive
    // profiler that reads a 100-TB table four times).
    "q83_table_profile" -> ((s, dir) => {
      // fanOut: the multi-countDistinct agg plans as an Expand that
      // multiplies every scanned row x5 BEFORE the first exchange —
      // above the single-row-group scan that whole stage is one task
      // (Tables.fanOut scaladoc; no-op at real scale). Counts/min/max
      // are exact, so partitioning cannot move the result.
      val li = graft.Tables.fanOut(t(s, dir, "lineitem"))
      def m(c: String) = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag",
        "l_shipdate")
      val aggs = count(lit(1)).as("n") +: cols.flatMap(m)
      val wide = li.agg(aggs.head, aggs.tail: _*)
      wide.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col("n"),
            col(s"${c}_nulls").as("n_null"),
            col(s"${c}_nd").as("n_distinct"),
            col(s"${c}_min").as("min_s"),
            col(s"${c}_max").as("max_s"))): _*)).as("p"))
        .select("p.*").orderBy("col_name")
    }),

    // incremental aggregate maintenance: per-user running aggregates
    // over all history EXCEPT the newest day live in a persisted state
    // table; the new day folds in as an algebraic merge (count/sum/max
    // are commutative monoids) — history is NEVER re-scanned. The
    // d27-style pattern for incremental ETL at 100 TB: state the size
    // of the key domain, delta the size of one day.
    "q51_incremental_agg" -> ((s, dir) => {
      val store = graft.TempDirs.createCleanedAtExit("graft-q51-store")
      val ev = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val lastDay = ev.agg(max("day")).head().getDate(0)
      def agg(d: DataFrame) = d.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("sv"),
          max("value").as("mx"))
      agg(ev.filter(col("day") < lit(lastDay)))
        .write.mode("overwrite").parquet(store)
      val state = s.read.parquet(store)
        .select(col("user_id"), col("n").as("n1"), col("sv").as("sv1"),
          col("mx").as("mx1"))
      val delta = agg(ev.filter(col("day") === lit(lastDay)))
        .select(col("user_id"), col("n").as("n2"), col("sv").as("sv2"),
          col("mx").as("mx2"))
      state.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
            .as("n"),
          round(coalesce(col("sv1"), lit(0.0))
            + coalesce(col("sv2"), lit(0.0)), 4).as("sum_value"),
          round(greatest(coalesce(col("mx1"), lit(Double.MinValue)),
            coalesce(col("mx2"), lit(Double.MinValue))), 4).as("max_value"))
        .orderBy("user_id")
    }),

    // gap-and-island sessionization, relational formulation: the same
    // 30-min-inactivity semantics as st02's flatMapGroupsWithState
    // state machine, expressed as lag -> break flag -> per-user
    // cumulative session index -> one groupBy. ONE user-keyed shuffle
    // serves the lag window, the cumsum window, and the session
    // aggregate (all partitioned by user_id); each user's sort is
    // partition-local — never a global sort. Emits SESSION-grain rows
    // (start/duration/n/value), a finer oracle surface than st02's
    // per-user rollup. Tie rows (equal ts) always land in the same
    // session regardless of intra-tie order: their pairwise gap is 0,
    // so whichever tie row inherits the gap-to-predecessor carries the
    // break for the whole group.
    "q52_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tms")
      events(s, dir)
        .select(col("user_id"), unix_millis(col("ts")).as("tms"),
          col("value"))
        .withColumn("brk",
          when(col("tms") - lag("tms", 1).over(w) > 1800000L, 1L)
            .otherwise(lit(0L)))
        .withColumn("sid", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("tms").as("start_ms"), max("tms").as("end_ms"),
          count(lit(1)).as("n_events"),
          round(sum("value"), 4).as("total_value"))
        .filter(col("user_id") < 50)
        .select(col("user_id"),
          date_format(timestamp_millis(col("start_ms")),
            "yyyy-MM-dd HH:mm:ss").as("s_start"),
          (col("end_ms") - col("start_ms")).as("dur_ms"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "s_start")
    }),

    // PageRank over the customer—supplier trade graph (who trades with
    // whom, via orders x lineitem), symmetrized so every node has
    // out-degree >= 1 (no dangling mass) — the iterative-join graph
    // operator next to d15's connected components. 3 fixed iterations;
    // the oracle replays the exact arithmetic with 3 unrolled
    // contribution/rank CTE pairs; ranks compared ROUNDED (sum order
    // is float-ambiguous, values are not)
    "q53_pagerank" -> ((s, dir) =>
      graft.ops.Graph.pageRank(tradeEdges(s, dir), iters = 3)
        .select(col("node"), round(col("pr"), 6).as("pr"))
        .orderBy("node")),

    // multi-source BFS over the same trade graph: hop distance from
    // the nation-0 suppliers to every reachable node, bounded at 3
    // hops — the frontier-expansion iterative-join pattern next to
    // q53's rank propagation and d15's connected components. Oracle:
    // WITH RECURSIVE walk (UNION-dedup bounds the expansion), MIN(hop)
    // deterministic synchronous label propagation over the trade
    // graph — the community-detection member of the iterative-join
    // family (q53 rank propagation, q55 frontier expansion, d15
    // min-label closure): most-frequent neighbor label, smallest label
    // on ties, 3 rounds. Oracle unrolls the rounds; the engine's
    // min(struct(-count, label)) argmax is replayed as a row_number
    // window over (count DESC, label)
    "q59_label_prop" -> ((s, dir) =>
      graft.ops.Graph.labelPropagation(tradeEdges(s, dir), iters = 3)
        .orderBy("node")),

    // connected components over the high-value trade slice (quantity
    // >= 49, extendedprice > 90k keeps the graph sparse enough to
    // carry dozens of real components at sf0.01 instead of one giant
    // blob) — the shared large-star/small-star kernel that also closes
    // d15/d25's dup clusters, here as a public graph-family entry.
    // Node ids: customer c -> 2c, supplier s -> 2s+1 (disjoint longs).
    // Labels = component minimum, which the oracle replays as
    // MIN(reachable id) via a recursive set-semantics CTE.
    "q84_connected_components" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49 && col("l_extendedprice") > 90000)
        .select("l_orderkey", "l_suppkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val e = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("a"),
          (col("l_suppkey") * 2 + 1).cast("long").as("b"))
        .distinct()
      graft.ops.Graph.connectedComponents(e, "a", "b")
        .orderBy("id")
    }),

    "q55_bfs_hops" -> ((s, dir) => {
      val seeds = t(s, dir, "supplier")
        .filter(col("s_nationkey") === 0)
        .select(concat(lit("s"), col("s_suppkey")).as("node"))
      graft.ops.Graph.bfsHops(tradeEdges(s, dir), seeds, maxHops = 3)
        .orderBy("node")
    }),

    // last-click attribution: each purchase credits the user's most
    // recent click at-or-before it, IF that click is within 24h;
    // campaigns derive from the click's props. Rides the asofJoin
    // machinery (one user-keyed union window, no range join) with the
    // click's (ts, campaign) packed as the ordered struct value, so
    // equal-ts resolution stays deterministic. The oracle's LATERAL
    // top-1 is equivalent because the latest at-or-before click is in
    // the 24h window iff any candidate is.
    "q64_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructType}
      val ev = events(s, dir).withColumn("k",
        from_json(col("props"), new StructType().add("k", LongType))
          .getField("k"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("k").as("camp"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val att = Relational.asofJoin(purchases, clicks, "user_id", "ts",
          struct(unix_micros(col("ts")).as("cts"),
            (col("camp") % 5).as("camp")),
          as = "lc")
        .withColumn("campaign",
          when(col("lc").isNotNull &&
            unix_micros(col("ts")) - col("lc.cts") <= 86400000000L,
            concat(lit("camp_"), col("lc.camp")))
          .otherwise(lit("organic")))
      att.groupBy("campaign")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum("value"), 4).as("revenue"))
        .orderBy("campaign")
    }),

    // conversion-latency percentiles per campaign: how long between
    // the attributed click (q64's asof machinery) and the purchase —
    // p50/p90 via the distributed exact-percentile selection (q24's
    // operator), so no per-campaign value list ever materializes.
    // Latencies are exact integer micros, so the cross-engine linear
    // interpolation starts from identical doubles.
    "q65_conversion_latency" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructType}
      val ev = events(s, dir).withColumn("k",
        from_json(col("props"), new StructType().add("k", LongType))
          .getField("k"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("k").as("camp"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val att = Relational.asofJoin(purchases, clicks, "user_id", "ts",
          struct(unix_micros(col("ts")).as("cts"),
            (col("camp") % 5).as("camp")),
          as = "lc")
        .withColumn("lat", unix_micros(col("ts")) - col("lc.cts"))
        .filter(col("lc").isNotNull && col("lat") <= 86400000000L)
        .select(concat(lit("camp_"), col("lc.camp")).as("campaign"),
          col("lat"))
      val counts = att.groupBy("campaign").agg(count(lit(1)).as("n"))
      graft.ops.Percentiles.exact(att, "campaign", "lat",
          Seq("p50" -> 0.5, "p90" -> 0.9))
        .join(broadcast(counts), Seq("campaign"))
        .select(col("campaign"), col("n"),
          round(col("p50"), 4).as("p50"), round(col("p90"), 4).as("p90"))
        .orderBy("campaign")
    }),

    // incremental JOIN-view maintenance (the join companion to q51's
    // incremental aggregate): orders x customer split into old
    // snapshot + append deltas on both sides; the maintained view
    // V ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB must equal the full recompute, which
    // is exactly what the oracle runs. Work is |Δ|-proportional —
    // the old view is never re-joined.
    "q63_incremental_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cc = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      val (oOld, oDelta) = (o.filter(col("o_orderkey") % 10 =!= 0),
        o.filter(col("o_orderkey") % 10 === 0))
      val (cOld, cDelta) = (cc.filter(col("o_custkey") % 20 =!= 0),
        cc.filter(col("o_custkey") % 20 === 0))
      val view = oOld.join(cOld, Seq("o_custkey"))
      Relational.incrementalJoin(view, oOld, oDelta, cOld, cDelta,
          "o_custkey")
        .select(col("o_orderkey"), col("o_custkey"),
          col("c_mktsegment"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    }),

    // market-basket association rules: part pairs co-occurring in >= 3
    // orders, with support and lift — the frequent-itemset family.
    // The pair generation is keyed on the order (fan-out bounded by
    // order size, the q58 edge-build argument — never quadratic in
    // parts); item supports attach via two part-keyed joins; lift's
    // (sup_ab * n) / (sup_a * sup_b) is integer-times-integer cast
    // once, so the float expression replays exactly.
    "q62_market_basket" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
        .cache() // feeds both roles of the pair join + item supports
      val nOrders = li.select("l_orderkey").distinct().count()
      val pairs = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
        .agg(count(lit(1)).as("sup_ab"))
        .filter(col("sup_ab") >= 3)
      val item = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("sup"))
      pairs
        .join(item.select(col("l_partkey").as("pa"), col("sup").as("sup_a")),
          Seq("pa"))
        .join(item.select(col("l_partkey").as("pb"), col("sup").as("sup_b")),
          Seq("pb"))
        .select(col("pa"), col("pb"), col("sup_ab"),
          col("sup_a"), col("sup_b"),
          round((col("sup_ab") * nOrders).cast("double")
            / (col("sup_a") * col("sup_b")), 6).as("lift"))
        .orderBy("pa", "pb")
    }),

    // per-node triangle counts over the supplier co-supply graph
    // (suppliers sharing an order; per-order fan-out is bounded by
    // order size, so the edge build is never quadratic in suppliers).
    // Degree-ordered orientation caps wedge fan-out at O(sqrt(m)) per
    // node — see Graph.triangleCounts. Oracle replays the exact
    // orientation + wedge-close chain; counts are integers, so the
    // hash-compare is exact. Edge build: see coSupplyEdges.
    "q58_triangles" -> ((s, dir) => {
      graft.ops.Graph.triangleCounts(coSupplyEdges(s, dir))
        .orderBy("node")
    }),

    // DOULION edge-sampled triangle estimate (Tsourakakis et al. KDD
    // 2009) — q58's density-guard fallback for graphs whose wedge
    // volume (preflighted by Graph.wedgeCount) exceeds any exact
    // budget: md5-keyed p=0.5 edge sampling (deterministic, oracle-
    // replayed like d14/m15), exact counting on the sparsified graph,
    // 1/p³ scaling. p³=0.125 is dyadic, so the scaled estimate is
    // bit-exact cross-engine; ±ε accuracy vs q58 is GraphSpec-gated.
    "q66_triangle_estimate" -> ((s, dir) => {
      graft.ops.Graph.triangleCountEstimate(coSupplyEdges(s, dir), p = 0.5)
        .orderBy("node")
    }),

    // grouped top-k as a RELATIONAL query through the native bounded
    // top-k aggregate (functions.TopKPairs — the ANN ranking stage
    // generalized): top-3 orders by total price per order priority.
    // The classic formulation is a per-group row_number window, which
    // shuffles and sorts EVERY order row; the aggregate forwards at
    // most 3 entries per (priority, map task). Prices rank on the
    // 2dp-rounded value with orderkey tie-break (cross-engine rank
    // rule), and the oracle proves the aggregate against ROW_NUMBER.
    "q67_grouped_topk" -> ((s, dir) => {
      graft.functions.TopKPairs.register(s)
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(graft.functions.TopKPairs.topK(
          round(col("o_totalprice"), 2), col("o_orderkey"),
          col("o_totalprice"), 3).as("top"))
        .select(col("o_orderpriority"),
          posexplode(col("top")).as(Seq("pos", "tk")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("int").as("rank"),
          col("tk.nbr_id").as("o_orderkey"),
          round(col("tk.score"), 2).as("o_totalprice"))
        .orderBy("o_orderpriority", "rank")
    }),

    // event-time RANGE window frame (trailing 24h per user): the
    // VALUE-bounded sliding aggregate q38's ROWS frames can't express —
    // frame membership follows the timestamp value, however many rows
    // land inside. Integer epoch-seconds ordering keys keep both
    // engines' frame boundaries exact; one user-keyed shuffle,
    // per-user partition-local sort, never a global one.
    "q54_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tsec")
        .rangeBetween(-86399L, 0L)
      events(s, dir)
        .filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts) div 1000000").as("tsec"), col("value"))
        .withColumn("n_24h", count(lit(1)).over(w))
        .withColumn("sum_24h", round(sum("value").over(w), 4))
        .select("user_id", "event_id", "tsec", "n_24h", "sum_24h")
        .orderBy("user_id", "tsec", "event_id")
    }),

    // running COUNT(DISTINCT) per user — a frame no engine's window
    // machinery supports directly. The workaround: sort each user's
    // rows by (type, time) and flag each type's first occurrence via
    // lag, then cumulative-sum the flags in time order. BOTH windows
    // partition by user_id only (the first orders by type to make
    // type-runs contiguous), so the whole query rides ONE user-keyed
    // exchange with two partition-local sorts — no second shuffle on
    // (user, type), no global sort
    "q57_running_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byType = Window.partitionBy("user_id")
        .orderBy("event_type", "tsec", "event_id")
      val byTime = Window.partitionBy("user_id")
        .orderBy("tsec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts) div 1000000").as("tsec"))
        .withColumn("first_seen",
          when(lag("event_type", 1).over(byType).isNull ||
            lag("event_type", 1).over(byType) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("n_types_seen", sum("first_seen").over(byTime))
        .select("user_id", "event_id", "tsec", "event_type",
          "n_types_seen")
        .orderBy("user_id", "tsec", "event_id")
    }),

    // pivot: order counts + total price by priority x status, explicit
    // pivot values so column order is deterministic
    "q23_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o",
          "P" -> "total_p"))
        .orderBy("o_orderpriority")),

    // exact percentiles (linear interpolation — matches DuckDB
    // quantile_cont): per-flag quartiles of extended price, computed by
    // the distributed range-sort selection (ops.Percentiles) — the
    // built-in `percentile` agg buffers a whole group per reducer
    // (13s at sf0.1, OOM at scale); this path keeps parallelism =
    // partitions even for one giant group
    "q24_percentiles" -> ((s, dir) =>
      graft.ops.Percentiles.exact(t(s, dir, "lineitem"), "l_returnflag",
          "l_extendedprice",
          Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
        .select(col("l_returnflag"),
          round(col("p25"), 4).as("p25"),
          round(col("p50"), 4).as("p50"),
          round(col("p75"), 4).as("p75"))
        .orderBy("l_returnflag")),

    // skew-salted join: lineitem x orders with the shuffle key widened
    // to (orderkey, salt) — same result as the plain join (oracle), but
    // a hot orderkey now spreads over 8 reducer partitions instead of
    // straggling on one. merge hint keeps the demo on the sort-merge
    // path (broadcast would hide the salted shuffle on test-sized data).
    "q25_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority").hint("merge")
      graft.rel.Relational.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
          saltFactor = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // bucketed co-located join: both sides pre-hashed into 8 buckets on
    // the join key at WRITE time, so the join itself needs zero
    // exchange (PlanSpec asserts no Exchange below the SortMergeJoin) —
    // the pay-the-shuffle-once layout for a fact table joined on the
    // same key by many queries.
    "q26_bucketed_join" -> ((s, dir) => {
      val wh = java.nio.file.Paths.get(
        graft.TempDirs.createCleanedAtExit("graft-q26-bucket"))
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      graft.sources.Bucketed.writeBucketed(li, "graft_li_bucketed",
        "l_orderkey", buckets = 8, path = s"$wh/li")
      graft.sources.Bucketed.writeBucketed(ord, "graft_ord_bucketed",
        "o_orderkey", buckets = 8, path = s"$wh/ord")
      graft.sources.Bucketed.coLocatedJoin(s, "graft_li_bucketed",
          "l_orderkey", "graft_ord_bucketed", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // interval (stabbing) join as an equi-join: lineitem ship windows
    // (deterministic 7-35 day spans — the slim schema has no receipt
    // date) stabbed by order dates, bin-bucketed so no BNLJ/cartesian
    // appears at any scale (PlanSpec-asserted); dates become day
    // numbers (monotonic, BETWEEN-preserving)
    "q27_interval_join" -> ((s, dir) => {
      val epoch = to_date(lit("1992-01-01"))
      val li = t(s, dir, "lineitem").filter(col("l_partkey") <= 20)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), epoch).as("d_start"),
          (datediff(col("l_shipdate"), epoch) +
            lit(7) + (col("l_linenumber") * 5) % 28).as("d_end"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("stab_key"), col("o_totalprice"),
          datediff(col("o_orderdate"), epoch).as("d_t"))
      graft.rel.Relational.intervalJoin(li, "d_start", "d_end",
          ord, "d_t", binWidth = 16)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("tot_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // hive-partitioned sink + partition-pruned read-back: orders laid
    // out as o_year=YYYY/ directories, then a one-year query reads ONLY
    // that directory — the scan's PartitionFilters (PlanSpec-asserted)
    // prune before any file opens. The first-line pruning lever for
    // time-series facts at scale.
    "q28_partitioned_prune" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        graft.TempDirs.createCleanedAtExit("graft-q28-part"))
      graft.sources.Partitioned.write(
        t(s, dir, "orders"), year(col("o_orderdate")), "o_year",
        out.toString)
      graft.sources.Partitioned.read(s, out.toString)
        .filter(col("o_year") === 1997)
        .groupBy(month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("o_month")
    }),

    // DYNAMIC partition pruning: q28 prunes on a literal the planner
    // sees; here the pruning values only exist at RUNTIME (a filtered
    // year dimension), so Catalyst injects a dynamicpruning subquery —
    // the broadcast dim's keys — into the fact scan's PartitionFilters
    // (PlanSpec asserts it). At 100 TB this is the difference between
    // scanning the whole history and scanning the dim-selected slice
    // when the slice is only known from a join.
    "q36_dpp_join" -> ((s, dir) => {
      val out = graft.TempDirs.createCleanedAtExit("graft-q36-dpp")
      graft.sources.Partitioned.write(
        t(s, dir, "orders"), year(col("o_orderdate")), "o_year", out)
      val fact = graft.sources.Partitioned.read(s, out)
      val dim = t(s, dir, "orders")
        .select(year(col("o_orderdate")).as("d_year")).distinct()
        .withColumn("d_label",
          when(col("d_year") % 2 === 0, "even").otherwise("odd"))
      fact.join(broadcast(dim.filter(col("d_label") === "odd")),
          fact("o_year") === dim("d_year"))
        .groupBy("o_year")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("o_year")
    }),

    // runtime bloom-filter join pruning (beyond ref) — the scan-side
    // ROW-pruning lever q36's DPP can't provide when the fact table
    // isn't partitioned by the join key: a selective dim predicate
    // (p_size) makes Catalyst's InjectRuntimeFilter build a bloom
    // filter over the dim's surviving join keys during planning and
    // AND a might_contain(xxhash64(l_partkey)) probe into the fact
    // scan, so non-matching lineitem rows die at the scan instead of
    // crossing the shuffle — at 100 TB that is the difference between
    // shuffling the whole fact table and shuffling the ~1/40th that
    // can possibly join. Confs are scoped to a cloned session
    // (Compact's pattern): the application-side size threshold
    // defaults to 10 GB (sized for real clusters — at harness SFs the
    // rule would never fire), and broadcast is disabled because bloom
    // injection targets shuffle joins (a broadcast join already
    // prunes at the probe). PlanSpec asserts might_contain lands in
    // the optimized plan. The result is a plain join — the oracle
    // proves the filter is transparent.
    "q68_runtime_filter" -> ((s, dir) => {
      val rf = s.newSession()
      rf.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      rf.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      rf.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = t(rf, dir, "lineitem")
      val pt = t(rf, dir, "part").filter(col("p_size") === 1)
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
            2).as("revenue"))
        .orderBy("p_brand")
    }),

    // AQE runtime skew-join re-plan (beyond ref): the one skew
    // mechanism the suite had not yet DEMONSTRATED — q81 splits the
    // null hot key declaratively and Relational.saltedJoin pre-salts
    // KNOWN hot keys, but the unknown-at-plan-time hot key is AQE's
    // job: it observes map-output sizes at the shuffle boundary and
    // splits the oversized partition across tasks at runtime.
    // Fixture: ~1/3 of lineitem re-keyed onto ONE hot orderkey,
    // joined to orders on a forced sort-merge path; thresholds are
    // scaled down (cloned session, q68's pattern) so sf0.01's hot
    // partition trips the same relative-size logic a 100-TB hot key
    // would trip at defaults. The oracle proves the re-plan is
    // TRANSPARENT (identical results); PlanSpec asserts the executed
    // adaptive plan carries the skew=true split marker.
    "q93_aqe_skew_join" -> ((s, dir) => {
      val aq = s.newSession()
      aq.conf.set("spark.sql.adaptive.enabled", "true")
      aq.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      aq.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      aq.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16384")
      aq.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "8192")
      aq.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        "false")
      // the join feeds a groupBy, so splitting the hot partition
      // introduces one extra exchange — AQE declines that trade by
      // default and must be told the skew split is worth it (it is:
      // the extra exchange is answer-sized, the hot partition is not)
      aq.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      aq.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // pinned: the skew geometry (hot-partition vs median ratio and
      // per-mapper chunk sizes) must not depend on the host session's
      // shuffle-partition count
      aq.conf.set("spark.sql.shuffle.partitions", "8")
      // repartition(8) gives the join shuffle REAL mappers: the
      // sf0.01 parquet is one row group, so however the scan is
      // byte-sliced only ONE task emits rows — and AQE splits a
      // skewed reduce partition by MAPPER ranges, so a single-mapper
      // hot partition is unsplittable (probe-measured: perMapper =
      // [0,..,264509,..,0] -> createSkewPartitionSpecs = None). At
      // 100 TB the input always has thousands of mappers; the
      // fixture must emulate that multiplicity for the same rule to
      // have something to split.
      val hot = t(aq, dir, "lineitem")
        .select(
          when(col("l_orderkey") % 3 === 0, lit(1L))
            .otherwise(col("l_orderkey")).as("jk"),
          col("l_extendedprice"))
        .repartition(8)
      val ord = t(aq, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      hot.join(ord, col("jk") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy("o_orderstatus")
    }),

    // JSON-lines ingest round-trip: write customers as JSONL, read
    // back with an explicit schema (no inference pass), aggregate —
    // write→read must equal the parquet truth
    "q29_json_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        graft.TempDirs.createCleanedAtExit("graft-q29-json"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_nationkey").cast("int").as("c_nationkey"),
          col("c_acctbal").cast("double").as("c_acctbal"))
      graft.sources.JsonLines.write(cust, out.toString)
      graft.sources.JsonLines.read(s, out.toString, cust.schema)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("c_nationkey")
    }),

    // ORC round-trip (third interchange format next to CSV/JSON-lines):
    // write orders to ORC with zlib, read back, aggregate — must equal
    // the same aggregate computed straight from the parquet truth,
    // proving types, nulls, and row counts survive the format. ORC is
    // a Spark-native columnar source (predicate pushdown, column
    // pruning) — no extra dependency.
    "q33_orc_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        graft.TempDirs.createCleanedAtExit("graft-q33-orc"))
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      orders.write.mode("overwrite").option("compression", "zlib")
        .orc(out.toString)
      s.read.schema(orders.schema).orc(out.toString)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // size-targeted compaction sink: a 64-partition (worst-case small-
    // files) input written through REBALANCE + AQE advisory sizing must
    // land in few target-sized files (CompactSpec counts them) and
    // round-trip losslessly — this query gates the lossless half
    "q34_compacted_write" -> ((s, dir) => {
      val out = java.nio.file.Paths.get(
        graft.TempDirs.createCleanedAtExit("graft-q34-compact"))
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")
        .repartition(64)
      graft.sources.Compact.write(li, out.toString, targetBytes = 4L << 20)
      s.read.parquet(out.toString)
        .groupBy("l_linenumber")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_linenumber")
    }),

    // Z-order layout rewrite: lineitem clustered on the Morton curve
    // over (partkey, orderkey) range-reduced to 10 bits each, written
    // as 16 z-sorted files, read back, and summarized per curve
    // bucket. The per-bucket min/max ranges ARE the point: each
    // 32nd of the curve spans <= 1/4 of x and <= 1/8 of y (alternating
    // bit halvings), the property that makes parquet min/max pruning
    // selective on EITHER key. The oracle replays the interleave as
    // pure div/mod arithmetic. File-extent behavior (range boundaries
    // are sampled) is LayoutSpec territory, not the oracle's.
    // row-group bloom filters — the fourth rung of the data-skipping
    // ladder (q28 partition prune, q56 z-order clustering, q74
    // manifest ranges, q82 THIS): point/IN predicates on a
    // high-cardinality key skip whole row groups whose bloom proves
    // the key absent, the case min/max stats can't help (uniformly
    // spread keys span every row group's range). Written via the
    // parquet-mr per-column option; the footer actually carrying the
    // filter is LayoutSpec-gated, content oracle-replayed from the
    // raw table.
    "q82_bloom_skip" -> ((s, dir) => {
      val out = graft.TempDirs.createCleanedAtExit("graft-q82-bloom")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
        .repartition(8)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_orderkey",
          "200000")
        .parquet(out)
      s.read.parquet(out)
        .filter(col("l_orderkey").isin(1L, 7L, 4711L, 29383L, 999983L))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_orderkey")
    }),

    "q56_zorder" -> ((s, dir) => {
      val out = graft.TempDirs.createCleanedAtExit("graft-q56-zorder")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 1024).as("x"),
          (col("l_orderkey") % 1024).as("y"))
      graft.sources.Layout.zorderWrite(li, "x", "y", out,
        numFiles = 16, bits = 10)
      val z = graft.sources.Layout.zValue(col("x"), col("y"), bits = 10)
      s.read.parquet(out)
        .groupBy(shiftright(z, 15).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .orderBy("zbucket")
    }),

    // schema-evolution read: v1 files (even orderkeys) predate the
    // o_orderpriority column, v2 files carry it; mergeSchema unions the
    // footers and v1 rows surface null priority — the aggregate over
    // the merged table must equal the oracle's parity-based replay
    "q35_schema_merge" -> ((s, dir) => {
      val out = graft.TempDirs.createCleanedAtExit("graft-q35-merge")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      orders.filter(col("o_orderkey") % 2 === 0)
        .drop("o_orderpriority")
        .write.mode("overwrite").parquet(s"$out/v1")
      orders.filter(col("o_orderkey") % 2 =!= 0)
        .write.mode("overwrite").parquet(s"$out/v2")
      graft.sources.Compact.readMerged(s, s"$out/v1", s"$out/v2")
        .groupBy(coalesce(col("o_orderpriority"), lit("(pre-schema)"))
          .as("priority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("priority")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_report_join" -> """
      SELECT n.n_name AS nation, r.r_name AS region,
             ROUND(c.cust_bal, 2) AS cust_bal, c.cust_cnt AS cust_cnt,
             ROUND(sp.supp_bal, 2) AS supp_bal
      FROM nation n
      JOIN region r ON n.n_regionkey = r.r_regionkey
      LEFT JOIN (SELECT c_nationkey, SUM(c_acctbal) AS cust_bal,
                        COUNT(*) AS cust_cnt
                 FROM customer GROUP BY c_nationkey) c
        ON n.n_nationkey = c.c_nationkey
      LEFT JOIN (SELECT s_nationkey, SUM(s_acctbal) AS supp_bal
                 FROM supplier GROUP BY s_nationkey) sp
        ON n.n_nationkey = sp.s_nationkey
      ORDER BY nation""",

    "q02_weighted_mean" -> """
      SELECT l_returnflag,
             ROUND(100 * SUM(l_quantity * l_extendedprice)
                   / SUM(l_extendedprice), 6) AS wmean
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q03_filter_in" -> """
      SELECT n_nationkey, n_name FROM nation
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_21')
      ORDER BY n_nationkey""",

    "q04_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA')
      ORDER BY c_custkey""",

    "q05_fullouter_chain" -> """
      WITH c AS (SELECT c_nationkey AS nationkey, AVG(c_acctbal) AS cust_avg
                 FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey AS nationkey, AVG(s_acctbal) AS supp_avg
                 FROM supplier GROUP BY 1),
           n AS (SELECT n_nationkey AS nationkey, n_name FROM nation)
      SELECT nationkey, n_name, ROUND(cust_avg, 2) AS cust_avg,
             ROUND(supp_avg, 2) AS supp_avg
      FROM c FULL JOIN s USING (nationkey) FULL JOIN n USING (nationkey)
      ORDER BY nationkey""",

    "q06_distinct_sort" -> """
      SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus""",

    "q07_union" -> """
      SELECT l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
      FROM (SELECT * FROM lineitem WHERE l_returnflag = 'R'
            UNION ALL
            SELECT * FROM lineitem WHERE l_returnflag <> 'R')
      GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q08_onehot" -> """
      SELECT o_orderstatus,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS pr_1_urgent,
        CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS pr_2_high,
        CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS pr_3_medium,
        CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS pr_4_not_specified,
        CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS pr_5_low
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q09_xbeta" -> """
      SELECT l_orderkey, l_linenumber, ROUND(xb, 6) AS xbeta,
             ROUND(1 / (1 + EXP(-xb)), 6) AS prob
      FROM (SELECT l_orderkey, l_linenumber,
              0.5 + (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.2
                  + (CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) * (-0.8)
                  + l_quantity * 0.01
                  + LN(((l_discount + 0.005) / 0.12)
                       / (1 - ((l_discount + 0.005) / 0.12))) * 2.0 AS xb
            FROM lineitem)
      ORDER BY l_orderkey, l_linenumber""",

    "q10_design_se" -> """
      SELECT l_returnflag, ROUND(swy / sw, 6) AS mean,
             ROUND(SQRT((n / (n - 1.0))
               * (swwyy - 2 * (swy / sw) * swwy
                  + (swy / sw) * (swy / sw) * sww) / (sw * sw)), 6) AS se
      FROM (SELECT l_returnflag,
              SUM(l_quantity * l_extendedprice) AS swy,
              SUM(l_extendedprice) AS sw,
              SUM(l_extendedprice * l_extendedprice
                  * l_quantity * l_quantity) AS swwyy,
              SUM(l_extendedprice * l_extendedprice * l_quantity) AS swwy,
              SUM(l_extendedprice * l_extendedprice) AS sww,
              COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag""",

    "q11_deviation" -> """
      WITH c AS (SELECT c_nationkey AS nationkey, AVG(c_acctbal) AS cust_avg
                 FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey AS nationkey, AVG(s_acctbal) AS supp_avg
                 FROM supplier GROUP BY 1)
      SELECT ROUND(AVG(POWER(cust_avg - supp_avg, 2)), 6) AS asd,
             ROUND(SQRT(AVG(POWER(cust_avg - supp_avg, 2))), 6) AS rasd,
             ROUND(AVG(ABS(cust_avg - supp_avg)), 6) AS aad
      FROM c FULL JOIN s USING (nationkey)""",

    "q12_rowid" -> """
      SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rid
      FROM orders ORDER BY o_orderkey""",

    "q13_counts" -> """
      SELECT c_nationkey, COUNT(*) AS n,
             COUNT(DISTINCT c_mktsegment) AS segs
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q14_geomean" -> """
      SELECT l_returnflag,
             ROUND(EXP(AVG(LN(1.0 + l_discount))), 6) AS geo_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q15_window_topk" -> """
      SELECT o_orderstatus, rn, o_orderkey, o_totalprice
      FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3 ORDER BY o_orderstatus, rn""",

    "q16_events_hourly" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    "q17_anti_join" -> """
      SELECT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_orderstatus = 'O'
                          AND o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q18_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             ROUND(AVG(l_quantity), 6) AS avg_qty,
             ROUND(AVG(l_discount), 6) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    // four chained stage-min joins == the engine's greedy fold. All
    // comparisons run on epoch MICROSECONDS (q19's trick): the raw
    // column is TIMESTAMP_NS and the engine truncates nanos -> micros,
    // so a strict ns-level > here could advance a stage the engine's
    // equal-after-truncation comparison would not.
    "q32_funnel" -> """
      WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        FROM events
        WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'),
      t1 AS (
        SELECT user_id, MIN(tus) AS t FROM ev
        WHERE event_type = 'view' GROUP BY 1),
      t2 AS (
        SELECT e.user_id, MIN(e.tus) AS t
        FROM ev e JOIN t1 USING (user_id)
        WHERE e.event_type = 'click' AND e.tus > t1.t GROUP BY 1),
      t3 AS (
        SELECT e.user_id, MIN(e.tus) AS t
        FROM ev e JOIN t2 USING (user_id)
        WHERE e.event_type = 'signup' AND e.tus > t2.t GROUP BY 1),
      t4 AS (
        SELECT e.user_id, MIN(e.tus) AS t
        FROM ev e JOIN t3 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.tus > t3.t GROUP BY 1)
      SELECT * FROM (
        SELECT 1 AS stage_idx, 'view' AS stage,
               (SELECT COUNT(*) FROM t1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM t2)
        UNION ALL SELECT 3, 'signup', (SELECT COUNT(*) FROM t3)
        UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM t4))
      WHERE n_users > 0 ORDER BY stage_idx""",

    "q31_cohort_retention" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      f AS (SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY 1),
      j AS (
        SELECT DISTINCT ev.user_id, f.cohort_d,
               date_diff('day', f.cohort_d, ev.d) AS day_offset
        FROM ev JOIN f USING (user_id))
      SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort, day_offset,
             COUNT(DISTINCT user_id) AS n_users
      FROM j GROUP BY cohort_d, day_offset ORDER BY cohort, day_offset""",

    "q30_shipping_priority" -> """
      SELECT l_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             o_orderpriority,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, o_date, l_orderkey
      LIMIT 10""",

    // as-of join replicated with the same union + running-last-value
    // plan the engine uses. epoch_us matches the engine's
    // nanos->micros timestamp truncation (raw ns ordering could
    // disagree for events inside the same microsecond); right rows
    // (side 0) sort before left at equal ts = at-or-before semantics.
    "q19_asof_join" -> """
      WITH u AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, 1 AS side,
               event_id, value AS click_value, NULL::DOUBLE AS rv
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)), 0,
               NULL, NULL, value
        FROM events WHERE event_type = 'purchase'),
      w AS (
        SELECT event_id, user_id, side, click_value,
               LAST_VALUE(rv IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY tus, side, rv
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS prev_purchase
        FROM u)
      SELECT event_id, user_id, ROUND(click_value, 4) AS click_value,
             ROUND(prev_purchase, 4) AS prev_purchase
      FROM w WHERE side = 1 ORDER BY event_id""",

    // the round-trip must reproduce the parquet truth exactly
    "q20_csv_roundtrip" -> """
      SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey""",

    "q22_rollup" -> """
      SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q37_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag) AS g_flag,
             GROUPING(l_linestatus) AS g_status,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      ORDER BY g_flag, g_status,
               l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q38_window_analytics" -> """
      SELECT user_id, event_id, seq, gap_us, mavg3
      FROM (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER w AS seq,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
               ROUND(AVG(value) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      ORDER BY user_id, seq""",

    "q39_avg_qty_subquery" -> """
      SELECT p.p_brand,
             COUNT(*) AS n_small,
             ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p.p_partkey)
      GROUP BY p.p_brand
      ORDER BY p.p_brand""",

    "q40_gap_fill" -> """
      WITH daily AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               ROUND(SUM(value), 4) AS day_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                 CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
              FROM daily GROUP BY 1))
      SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
             LAST_VALUE(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
             d.day_value IS NULL AS is_gap
      FROM spine s
      LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
      ORDER BY s.user_id, s.day""",

    // same IGNORE-NULLS window pair; date_diff argument order mirrors
    // Spark's datediff(end, start); MAX (not avg) keeps the daily
    // inputs bit-identical across engines
    "q60_interpolate" -> """
      WITH daily AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               ROUND(MAX(value), 4) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                 CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
              FROM daily GROUP BY 1)),
      j AS (
        SELECT s.user_id, s.day, d.y,
               LAST_VALUE(d.y IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS py,
               LAST_VALUE(CASE WHEN d.y IS NOT NULL THEN s.day END
                 IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
               FIRST_VALUE(d.y IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ny,
               FIRST_VALUE(CASE WHEN d.y IS NOT NULL THEN s.day END
                 IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
      SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
             CASE WHEN y IS NOT NULL THEN y
                  ELSE py + (ny - py)
                       * (CAST(date_diff('day', pd, day) AS DOUBLE)
                          / CAST(date_diff('day', pd, nd) AS DOUBLE))
             END AS y_interp,
             y IS NULL AS is_interp
      FROM j ORDER BY user_id, day""",

    // native percent_rank over the composite (bal, id) order — all
    // ranks distinct, so it equals the engine's (rank-1)/(n-1)
    "q61_percent_rank" -> """
      SELECT c_custkey, c_mktsegment AS seg,
             ROUND(c_acctbal, 2) AS bal,
             percent_rank() OVER (PARTITION BY c_mktsegment
               ORDER BY ROUND(c_acctbal, 2), c_custkey) AS pr
      FROM customer ORDER BY c_custkey""",

    "q41_setops" -> """
      WITH day1 AS (
        SELECT user_id, event_type FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-02'),
      p AS (SELECT DISTINCT user_id FROM day1
            WHERE event_type = 'purchase'),
      e AS (SELECT DISTINCT user_id FROM day1
            WHERE event_type = 'error')
      SELECT user_id, 'both' AS side FROM (
        SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
      UNION ALL
      SELECT user_id, 'purchase_only' AS side FROM (
        SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
      UNION ALL
      SELECT user_id, 'error_only' AS side FROM (
        SELECT user_id FROM e EXCEPT SELECT user_id FROM p)
      ORDER BY user_id, side""",

    "q42_sliding_window" -> """
      WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_type, value
        FROM events),
      x AS (
        SELECT tus - (tus % 900000000) - 900000000 * k.k AS ws,
               event_type, value
        FROM e, (SELECT unnest(generate_series(0, 3)) AS k) k)
      SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS w_start,
             event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      FROM x GROUP BY 1, 2 ORDER BY w_start, event_type""",

    "q44_cube" -> """
      SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n,
             GROUPING(l_returnflag) AS g_flag,
             GROUPING(l_linestatus) AS g_status
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status,
               l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q46_corrupt_ingest" -> """
      SELECT 'corrupt' AS status, 3 AS n, CAST(NULL AS BIGINT) AS sum_key
      UNION ALL
      SELECT 'valid' AS status, COUNT(*) AS n,
             CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
      FROM nation
      ORDER BY status""",

    "q47_merge_upsert" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100 AS o_totalprice,
               CASE WHEN o_orderkey % 17 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 13 = 0 OR o_orderkey % 17 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 19 = 0),
      m AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice,
               c.op
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey)
      SELECT o_orderkey, o_orderstatus,
             ROUND(o_totalprice, 2) AS o_totalprice
      FROM m WHERE op IS NULL OR op = 'U'
      ORDER BY o_orderkey""",

    "q48_scd2" -> """
      WITH f AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               MIN(event_type) AS event_type
        FROM events GROUP BY 1, 2),
      c AS (
        SELECT user_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                 AS prev
        FROM f),
      r AS (
        SELECT user_id, ts, event_type
        FROM c WHERE prev IS NULL OR prev <> event_type),
      v AS (
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 AS valid_to,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts)
                 AS version
        FROM r)
      SELECT user_id, version, event_type,
             strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             (valid_to IS NULL) AS is_current
      FROM v ORDER BY user_id, version""",

    // JSON path semantics replayed: k extracted as BIGINT, the
    // missing path is NULL everywhere
    "q76_variant_extract" -> """
      WITH e AS (
        SELECT event_type, CAST(props->>'k' AS BIGINT) AS k,
               props->>'missing' AS miss
        FROM events)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k,
             CAST(SUM(CASE WHEN miss IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_missing
      FROM e GROUP BY 1 ORDER BY 1""",

    // the SCD2 build + the textbook interval join (valid_from <= pts
    // < valid_to, open tail) — the as-of carry-forward must equal it
    "q77_pit_join" -> """
      WITH f AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               MIN(event_type) AS event_type
        FROM events GROUP BY 1, 2),
      c AS (
        SELECT user_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                 AS prev
        FROM f),
      v AS (
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 AS valid_to
        FROM c WHERE prev IS NULL OR prev <> event_type),
      p AS (
        SELECT user_id,
               CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS pts,
               event_id
        FROM events WHERE event_id % 7 = 0),
      j AS (
        SELECT p.event_id, v.event_type AS status_at
        FROM p JOIN v ON p.user_id = v.user_id
          AND v.valid_from <= p.pts
          AND (v.valid_to IS NULL OR p.pts < v.valid_to))
      SELECT status_at, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(event_id) AS BIGINT) AS id_sum
      FROM j GROUP BY 1 ORDER BY 1""",

    // identical exact-decimal pipeline; the cast back to double is
    // correctly-rounded from the same exact decimal on both engines
    "q78_decimal_totals" -> """
      WITH d AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
               CAST(l_discount AS DECIMAL(18,4)) AS dd
        FROM lineitem)
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p) AS DOUBLE) AS sum_price,
             CAST(SUM(p * (CAST(1 AS DECIMAL(18,2)) - dd)) AS DOUBLE)
               AS sum_disc_price
      FROM d GROUP BY 1 ORDER BY 1""",

    // the identical recursion, DuckDB's // integer division
    "q79_recursive_cte" -> """
      WITH RECURSIVE anc(k, cur, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer
        WHERE c_custkey <= 200
        UNION ALL
        SELECT k, cur // 2, depth + 1 FROM anc WHERE cur > 1)
      SELECT depth, CAST(COUNT(*) AS BIGINT) AS n FROM anc
      WHERE cur = 1 GROUP BY depth ORDER BY depth""",

    "q80_lateral_topk" -> """
      SELECT n.n_name, s.s_suppkey, s.bal
      FROM nation n, LATERAL (
        SELECT s_suppkey, ROUND(s_acctbal, 2) AS bal FROM supplier
        WHERE s_nationkey = n.n_nationkey
        ORDER BY ROUND(s_acctbal, 2) DESC, s_suppkey LIMIT 2) s
      ORDER BY n.n_name, bal DESC, s_suppkey""",

    // the plain left join IS the oracle: the null-split is plan
    // surgery, not semantics
    "q81_null_skew_join" -> """
      WITH e AS (
        SELECT event_id, value,
               CASE WHEN event_id % 3 = 0 THEN NULL
                    ELSE user_id END AS k
        FROM events),
      j AS (
        SELECT COALESCE(c.c_mktsegment, 'NONE') AS segment, e.value
        FROM e LEFT JOIN customer c ON e.k = c.c_custkey)
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(value), 2) AS sum_value
      FROM j GROUP BY 1 ORDER BY 1""",

    "q83_table_profile" -> """
      WITH m AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS a1,
               COUNT(DISTINCT l_orderkey) AS a2,
               CAST(MIN(l_orderkey) AS VARCHAR) AS a3,
               CAST(MAX(l_orderkey) AS VARCHAR) AS a4,
               SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS b1,
               COUNT(DISTINCT l_quantity) AS b2,
               CAST(MIN(l_quantity) AS VARCHAR) AS b3,
               CAST(MAX(l_quantity) AS VARCHAR) AS b4,
               SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS c1,
               COUNT(DISTINCT l_returnflag) AS c2,
               CAST(MIN(l_returnflag) AS VARCHAR) AS c3,
               CAST(MAX(l_returnflag) AS VARCHAR) AS c4,
               SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS d1,
               COUNT(DISTINCT l_shipdate) AS d2,
               CAST(MIN(l_shipdate) AS VARCHAR) AS d3,
               CAST(MAX(l_shipdate) AS VARCHAR) AS d4
        FROM lineitem)
      SELECT 'l_orderkey' AS col_name, CAST(n AS BIGINT) AS n,
             CAST(a1 AS BIGINT) AS n_null, CAST(a2 AS BIGINT)
               AS n_distinct, a3 AS min_s, a4 AS max_s FROM m
      UNION ALL
      SELECT 'l_quantity', CAST(n AS BIGINT), CAST(b1 AS BIGINT),
             CAST(b2 AS BIGINT), b3, b4 FROM m
      UNION ALL
      SELECT 'l_returnflag', CAST(n AS BIGINT), CAST(c1 AS BIGINT),
             CAST(c2 AS BIGINT), c3, c4 FROM m
      UNION ALL
      SELECT 'l_shipdate', CAST(n AS BIGINT), CAST(d1 AS BIGINT),
             CAST(d2 AS BIGINT), d3, d4 FROM m
      ORDER BY col_name""",

    "q49_unpivot" -> """
      WITH w AS (
        SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(AVG(l_discount), 4) AS avg_disc
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'avg_disc' AS metric, avg_disc AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM w
      UNION ALL
      SELECT l_returnflag, 'sum_qty', sum_qty FROM w
      ORDER BY l_returnflag, metric""",

    "q50_json_extract" -> """
      WITH e AS (
        SELECT event_type, CAST(props->>'k' AS BIGINT) AS k
        FROM events)
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM e GROUP BY 1 ORDER BY event_type""",

    // the incremental split/merge is algebraically invisible: the
    // oracle is the plain full-history aggregate
    "q51_incremental_agg" -> """
      SELECT user_id, COUNT(*) AS n,
             ROUND(SUM(value), 4) AS sum_value,
             ROUND(MAX(value), 4) AS max_value
      FROM events GROUP BY 1 ORDER BY user_id""",

    // session-grain gap-and-island replay: identical lag/cumsum shape;
    // epoch_ms matches the engine's unix_millis micro->ms truncation.
    // Tie rows share a session whichever of them carries the break, so
    // the grouping is order-stable (see the engine-side note).
    "q52_sessionize" -> """
      WITH m AS (
        SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms, value,
               CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
                      - LAG(epoch_ms(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY ts) > 1800000
                    THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tms
                    ROWS UNBOUNDED PRECEDING) AS sid
        FROM m)
      SELECT user_id,
             strftime(make_timestamp(MIN(tms) * 1000),
               '%Y-%m-%d %H:%M:%S') AS s_start,
             MAX(tms) - MIN(tms) AS dur_ms,
             COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
      FROM g WHERE user_id < 50
      GROUP BY user_id, sid
      ORDER BY user_id, s_start""",

    // exact 3-iteration PageRank replay: same symmetrized edge list,
    // same (1.0 - 0.85)/n jump term (written as the SAME float
    // expression — the literal 0.15 is one ulp away), one
    // contribution/rank CTE pair per iteration
    "q53_pagerank" -> """
      WITH e0 AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
      deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
      r0 AS (SELECT src AS node, 1.0 / nn.n AS pr FROM deg, nn),
      c1 AS (SELECT e.dst AS node, SUM(r0.pr / d.deg) AS m
             FROM edges e JOIN r0 ON e.src = r0.node
             JOIN deg d ON e.src = d.src GROUP BY 1),
      r1 AS (SELECT d.src AS node,
                    (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c1.m, 0.0) AS pr
             FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.node = d.src),
      c2 AS (SELECT e.dst AS node, SUM(r1.pr / d.deg) AS m
             FROM edges e JOIN r1 ON e.src = r1.node
             JOIN deg d ON e.src = d.src GROUP BY 1),
      r2 AS (SELECT d.src AS node,
                    (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c2.m, 0.0) AS pr
             FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.node = d.src),
      c3 AS (SELECT e.dst AS node, SUM(r2.pr / d.deg) AS m
             FROM edges e JOIN r2 ON e.src = r2.node
             JOIN deg d ON e.src = d.src GROUP BY 1),
      r3 AS (SELECT d.src AS node,
                    (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c3.m, 0.0) AS pr
             FROM deg d CROSS JOIN nn LEFT JOIN c3 ON c3.node = d.src)
      SELECT node, ROUND(pr, 6) AS pr FROM r3 ORDER BY node""",

    // component label = MIN over the reachability closure, computed by
    // a set-semantics recursive CTE (UNION dedups states, so the walk
    // terminates); the engine's star-forest fixpoint labels every node
    // with the same component minimum
    "q84_connected_components" -> """
      WITH RECURSIVE e0 AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS a,
               CAST(l_suppkey * 2 + 1 AS BIGINT) AS b
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity >= 49 AND l_extendedprice > 90000),
      edges AS (SELECT a, b FROM e0
                UNION ALL SELECT b AS a, a AS b FROM e0),
      reach(node, r) AS (
        SELECT a AS node, a AS r FROM edges
        UNION
        SELECT e.a AS node, reach.r
        FROM edges e JOIN reach ON e.b = reach.node)
      SELECT node AS id, CAST(MIN(r) AS BIGINT) AS comp
      FROM reach GROUP BY node ORDER BY id""",

    // three LPA rounds unrolled; per round the engine's single-agg
    // argmax (min over (-count, label) structs) appears as the
    // row_number-over-(count DESC, label) window — identical
    // deterministic semantics
    "q59_label_prop" -> """
      WITH e0 AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
      l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
      c1 AS (SELECT e.dst, l.label, COUNT(*) AS c
             FROM edges e JOIN l0 l ON e.src = l.node GROUP BY 1, 2),
      l1 AS (SELECT dst AS node, label FROM (
               SELECT dst, label, row_number() OVER (
                 PARTITION BY dst ORDER BY c DESC, label) AS rn
               FROM c1) WHERE rn = 1),
      c2 AS (SELECT e.dst, l.label, COUNT(*) AS c
             FROM edges e JOIN l1 l ON e.src = l.node GROUP BY 1, 2),
      l2 AS (SELECT dst AS node, label FROM (
               SELECT dst, label, row_number() OVER (
                 PARTITION BY dst ORDER BY c DESC, label) AS rn
               FROM c2) WHERE rn = 1),
      c3 AS (SELECT e.dst, l.label, COUNT(*) AS c
             FROM edges e JOIN l2 l ON e.src = l.node GROUP BY 1, 2),
      l3 AS (SELECT dst AS node, label FROM (
               SELECT dst, label, row_number() OVER (
                 PARTITION BY dst ORDER BY c DESC, label) AS rn
               FROM c3) WHERE rn = 1)
      SELECT node, label FROM l3 ORDER BY node""",

    // frontier expansion replayed as a recursive CTE; the UNION is
    // set-semantics, so each (node, hop) row appears once and the
    // hop < 3 guard bounds the walk exactly like maxHops
    "q55_bfs_hops" -> """
      WITH RECURSIVE e0 AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst AS src, src AS dst FROM e0),
      walk(node, hop) AS (
        SELECT DISTINCT 's' || s_suppkey AS node, CAST(0 AS BIGINT) AS hop
        FROM supplier WHERE s_nationkey = 0
        UNION
        SELECT e.dst AS node, w.hop + 1 AS hop
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hop < 3)
      SELECT node, MIN(hop) AS hop FROM walk GROUP BY node
      ORDER BY node""",

    // LATERAL top-1 last click per purchase — equivalent to the
    // engine's asof+window form because the latest at-or-before click
    // is inside the 24h window iff any candidate is; same
    // (ts, campaign) DESC tie resolution
    "q64_attribution" -> """
      WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
               event_type, value,
               CAST(props->>'k' AS BIGINT) % 5 AS camp
        FROM events),
      c AS (SELECT user_id, tus, camp FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, tus, value FROM e
            WHERE event_type = 'purchase'),
      a AS (
        SELECT p.value,
               CASE WHEN c2.tus IS NOT NULL
                     AND p.tus - c2.tus <= 86400000000
                    THEN 'camp_' || c2.camp ELSE 'organic' END AS campaign
        FROM p LEFT JOIN LATERAL (
          SELECT c.tus, c.camp FROM c
          WHERE c.user_id = p.user_id AND c.tus <= p.tus
          ORDER BY c.tus DESC, c.camp DESC LIMIT 1) c2 ON TRUE)
      SELECT campaign, COUNT(*) AS n_purchases,
             ROUND(SUM(value), 4) AS revenue
      FROM a GROUP BY 1 ORDER BY campaign""",

    // q64's LATERAL attribution restricted to in-window conversions;
    // quantile_cont matches the engine's linear interpolation
    "q65_conversion_latency" -> """
      WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
               event_type, CAST(props->>'k' AS BIGINT) % 5 AS camp
        FROM events),
      c AS (SELECT user_id, tus, camp FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, tus FROM e WHERE event_type = 'purchase'),
      a AS (
        SELECT 'camp_' || c2.camp AS campaign, p.tus - c2.tus AS lat
        FROM p JOIN LATERAL (
          SELECT c.tus, c.camp FROM c
          WHERE c.user_id = p.user_id AND c.tus <= p.tus
          ORDER BY c.tus DESC, c.camp DESC LIMIT 1) c2 ON TRUE
        WHERE p.tus - c2.tus <= 86400000000)
      SELECT campaign, COUNT(*) AS n,
             ROUND(quantile_cont(CAST(lat AS DOUBLE), 0.5), 4) AS p50,
             ROUND(quantile_cont(CAST(lat AS DOUBLE), 0.9), 4) AS p90
      FROM a GROUP BY 1 ORDER BY campaign""",

    // the full recompute the incremental view must equal
    "q63_incremental_join" -> """
      SELECT o_orderkey, o_custkey, c_mktsegment,
             ROUND(o_totalprice, 2) AS price
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey""",

    // same pair generation + support joins; lift cast once from the
    // integer product, matching the engine's expression
    "q62_market_basket" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
      pairs AS (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb,
               COUNT(*) AS sup_ab
        FROM li x JOIN li y
          ON x.l_orderkey = y.l_orderkey
         AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      item AS (SELECT l_partkey, COUNT(*) AS sup FROM li GROUP BY 1)
      SELECT p.pa, p.pb, p.sup_ab, a.sup AS sup_a, b.sup AS sup_b,
             ROUND(CAST(p.sup_ab * n.n_orders AS DOUBLE)
                   / (a.sup * b.sup), 6) AS lift
      FROM pairs p
      JOIN item a ON p.pa = a.l_partkey
      JOIN item b ON p.pb = b.l_partkey
      CROSS JOIN n
      ORDER BY p.pa, p.pb""",

    // same degree-ordered orientation -> wedge join -> closing-edge
    // semi-join -> per-corner count; integer arithmetic throughout
    "q58_triangles" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
             FROM li x JOIN li y
               ON x.l_orderkey = y.l_orderkey
              AND x.l_suppkey < y.l_suppkey),
      deg AS (SELECT node, COUNT(*) AS deg FROM
                (SELECT a AS node FROM e0
                 UNION ALL SELECT b AS node FROM e0)
              GROUP BY node),
      e AS (SELECT CASE WHEN da.deg < db.deg
                          OR (da.deg = db.deg AND e0.a < e0.b)
                        THEN e0.a ELSE e0.b END AS lo,
                   CASE WHEN da.deg < db.deg
                          OR (da.deg = db.deg AND e0.a < e0.b)
                        THEN e0.b ELSE e0.a END AS hi
            FROM e0 JOIN deg da ON e0.a = da.node
                    JOIN deg db ON e0.b = db.node),
      w AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
            FROM e e1 JOIN e e2
              ON e1.lo = e2.lo AND e1.hi < e2.hi),
      tri AS (SELECT x, y, z FROM w
              WHERE EXISTS (SELECT 1 FROM e
                            WHERE (e.lo = w.y AND e.hi = w.z)
                               OR (e.lo = w.z AND e.hi = w.y))),
      c AS (SELECT node, COUNT(*) AS n_tri FROM
              (SELECT x AS node FROM tri
               UNION ALL SELECT y AS node FROM tri
               UNION ALL SELECT z AS node FROM tri)
            GROUP BY node)
      SELECT node, n_tri FROM c ORDER BY node""",

    // ROW_NUMBER proof of the native bounded top-k aggregate
    "q67_grouped_topk" -> """
      SELECT o_orderpriority, rank, o_orderkey,
             ROUND(o_totalprice, 2) AS o_totalprice
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey) AS rank
        FROM orders)
      WHERE rank <= 3
      ORDER BY o_orderpriority, rank""",

    // q58's chain on the md5-sampled (p=0.5) edge list + 1/p³ scaling
    // — the DOULION draw replays hashUniform(a||'_'||b, 'doulion')
    "q66_triangle_estimate" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      eall AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
               FROM li x JOIN li y
                 ON x.l_orderkey = y.l_orderkey
                AND x.l_suppkey < y.l_suppkey),
      e0 AS (SELECT a, b FROM eall
             WHERE CAST(list_sum(list_transform(range(1, 9), i ->
                     (strpos('0123456789abcdef',
                        substr(md5(CAST(a AS VARCHAR) || '_' ||
                               CAST(b AS VARCHAR) || 'doulion'),
                          CAST(i AS INT), 1)) - 1)
                     * CAST(power(16, 8 - i) AS BIGINT))) AS DOUBLE)
                   / 4294967296.0 < 0.5),
      deg AS (SELECT node, COUNT(*) AS deg FROM
                (SELECT a AS node FROM e0
                 UNION ALL SELECT b AS node FROM e0)
              GROUP BY node),
      e AS (SELECT CASE WHEN da.deg < db.deg
                          OR (da.deg = db.deg AND e0.a < e0.b)
                        THEN e0.a ELSE e0.b END AS lo,
                   CASE WHEN da.deg < db.deg
                          OR (da.deg = db.deg AND e0.a < e0.b)
                        THEN e0.b ELSE e0.a END AS hi
            FROM e0 JOIN deg da ON e0.a = da.node
                    JOIN deg db ON e0.b = db.node),
      w AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
            FROM e e1 JOIN e e2
              ON e1.lo = e2.lo AND e1.hi < e2.hi),
      tri AS (SELECT x, y, z FROM w
              WHERE EXISTS (SELECT 1 FROM e
                            WHERE (e.lo = w.y AND e.hi = w.z)
                               OR (e.lo = w.z AND e.hi = w.y))),
      c AS (SELECT node, COUNT(*) AS n_tri FROM
              (SELECT x AS node FROM tri
               UNION ALL SELECT y AS node FROM tri
               UNION ALL SELECT z AS node FROM tri)
            GROUP BY node)
      SELECT node, ROUND(n_tri / 0.125, 4) AS est_tri
      FROM c ORDER BY node""",

    // the same first-occurrence-flag + running-sum replay
    "q57_running_distinct" -> """
      WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS tsec
        FROM events WHERE user_id < 50),
      f AS (
        SELECT user_id, event_id, tsec, event_type,
               CASE WHEN lag(event_type) OVER
                      (PARTITION BY user_id
                       ORDER BY event_type, tsec, event_id)
                      IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS first_seen
        FROM e)
      SELECT user_id, event_id, tsec, event_type,
             CAST(SUM(first_seen) OVER
               (PARTITION BY user_id ORDER BY tsec, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_types_seen
      FROM f ORDER BY user_id, tsec, event_id""",

    // same integer-second RANGE frame; epoch_us // 1000000 matches the
    // engine's unix_micros div truncation
    "q54_range_frame" -> """
      WITH e AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS tsec, value
        FROM events WHERE user_id < 50)
      SELECT user_id, event_id, tsec,
             COUNT(*) OVER w AS n_24h,
             ROUND(SUM(value) OVER w, 4) AS sum_24h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsec
                   RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, tsec, event_id""",

    "q23_pivot" -> """
      SELECT o_orderpriority,
             ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END),
               2) AS total_f,
             ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END),
               2) AS total_o,
             ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END),
               2) AS total_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q24_percentiles" -> """
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // salting must be invisible in the result — plain join is the truth
    "q25_salted_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // bucketing is a physical layout choice — plain join is the truth
    "q26_bucketed_join" -> """
      SELECT o_orderpriority,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q27_interval_join" -> """
      WITH li AS (
        SELECT l_orderkey, l_linenumber,
               date_diff('day', DATE '1992-01-01', l_shipdate) AS d_start,
               date_diff('day', DATE '1992-01-01', l_shipdate)
                 + 7 + (l_linenumber * 5) % 28 AS d_end
        FROM lineitem WHERE l_partkey <= 20),
      ord AS (
        SELECT o_totalprice,
               date_diff('day', DATE '1992-01-01', o_orderdate) AS d_t
        FROM orders)
      SELECT li.l_orderkey, li.l_linenumber,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(ord.o_totalprice), 2) AS tot_price
      FROM li JOIN ord ON ord.d_t BETWEEN li.d_start AND li.d_end
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // skyline = rows with no strict dominator (min price, max size)
    "q21_skyline" -> """
      SELECT p_partkey, p_size, ROUND(p_retailprice, 2) AS p_retailprice
      FROM part a
      WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      ORDER BY p_partkey""",

    // partitioned layout is a physical choice — plain filter is truth
    "q28_partitioned_prune" -> """
      SELECT month(o_orderdate) AS o_month,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY 1 ORDER BY 1""",

    // the JSONL hop must be lossless — parquet truth is the oracle
    "q29_json_roundtrip" -> """
      SELECT CAST(c_nationkey AS INT) AS c_nationkey,
             COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS sum_bal
      FROM customer GROUP BY 1 ORDER BY 1""",

    // round-trip truth: the same aggregate straight from parquet
    "q33_orc_roundtrip" -> """
      SELECT o_orderstatus, COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1""",

    // the runtime-pruned join replayed statically
    "q36_dpp_join" -> """
      WITH dim AS (
        SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS d_year
        FROM orders),
      odd AS (SELECT d_year FROM dim WHERE d_year % 2 <> 0)
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders JOIN odd
        ON CAST(year(o_orderdate) AS INT) = odd.d_year
      GROUP BY 1 ORDER BY 1""",

    // the identical crossing arithmetic over the identical edge table
    // (generated from the same UsGeo data the engine broadcasts);
    // coordinates forced to DOUBLE so every comparison is the same
    // IEEE op; integer crossing sums make parity order-independent
    "q72_spatial_join" -> s"""
      WITH e0 AS (SELECT * FROM (VALUES
        ${graft.ops.Spatial.conusEdgeValues})
        t(st, ring, x1, y1, x2, y2)),
      edges AS (
        SELECT st, ring, CAST(x1 AS DOUBLE) AS x1, CAST(y1 AS DOUBLE) AS y1,
               CAST(x2 AS DOUBLE) AS x2, CAST(y2 AS DOUBLE) AS y2
        FROM e0),
      pts AS (
        SELECT c_custkey AS id,
               -125.0 + CAST(c_custkey * 7 % 560 AS DOUBLE) / 10.0 AS px,
               25.0 + CAST(c_custkey * 13 % 240 AS DOUBLE) / 10.0 AS py
        FROM customer),
      cr AS (
        SELECT p.id, e.st, e.ring,
               SUM(CASE WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                         AND p.px < e.x1 + (p.py - e.y1) * (e.x2 - e.x1)
                                             / (e.y2 - e.y1)
                   THEN 1 ELSE 0 END) AS c
        FROM pts p CROSS JOIN edges e
        GROUP BY 1, 2, 3),
      inst AS (
        SELECT id, st FROM cr GROUP BY id, st
        HAVING SUM(CASE WHEN c % 2 = 1 THEN 1 ELSE 0 END) > 0),
      pick AS (SELECT id, MIN(st) AS state FROM inst GROUP BY 1)
      SELECT state, COUNT(*) AS n_points, CAST(SUM(id) AS BIGINT) AS id_sum
      FROM (SELECT p.id, COALESCE(k.state, 'NONE') AS state
            FROM pts p LEFT JOIN pick k ON p.id = k.id)
      GROUP BY 1 ORDER BY 1""",

    // identical snapshot synthesis + full-outer diff; key_sum cast
    // (DuckDB SUM(BIGINT) -> HUGEINT)
    // both snapshots' CONTENT replayed from the raw table: v1 = base,
    // v2 = the q47-style merge replay of the same change batch
    // the expectation split replayed: per-constraint violation counts
    // over the planted corruption + the committed (all-pass) count
    // the skewed join replayed flat — AQE's split must be invisible
    // in the results
    "q93_aqe_skew_join" -> """
      WITH hot AS (
        SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1
                    ELSE l_orderkey END AS jk,
               l_extendedprice
        FROM lineitem)
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(SUM(l_extendedprice), 2) AS revenue
      FROM hot JOIN orders ON jk = o_orderkey
      GROUP BY 1 ORDER BY 1""",

    "q92_expectations" -> """
      WITH batch AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 47 = 0 THEN 'Z'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 43 = 0 THEN -o_totalprice
                    ELSE o_totalprice END AS o_totalprice
        FROM orders)
      SELECT 'price_nonneg' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM batch WHERE NOT (o_totalprice >= 0)
      UNION ALL
      SELECT 'status_known', CAST(COUNT(*) AS BIGINT)
      FROM batch WHERE NOT (o_orderstatus IN ('O', 'F', 'P'))
      UNION ALL
      SELECT '__committed', CAST(COUNT(*) AS BIGINT)
      FROM batch
      WHERE o_totalprice >= 0 AND o_orderstatus IN ('O', 'F', 'P')
      ORDER BY expectation""",

    // v1 / bad v2 / restored v3 (= v1's content under version 3)
    "q91_restore" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
                 AS o_totalprice,
               CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 31 = 0 OR o_orderkey % 37 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT (MAX(o_orderkey) // 10000000 + 1)
                             * 10000000 FROM base), 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 41 = 0),
      v2 AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(SUM(o_totalprice), 2) AS total FROM base
      UNION ALL
      SELECT 2, CAST(COUNT(*) AS BIGINT), ROUND(SUM(o_totalprice), 2)
      FROM v2
      UNION ALL
      SELECT 3, CAST(COUNT(*) AS BIGINT), ROUND(SUM(o_totalprice), 2)
      FROM base
      ORDER BY version""",

    "q73_time_travel" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
                 AS o_totalprice,
               CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 31 = 0 OR o_orderkey % 37 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT (MAX(o_orderkey) // 10000000 + 1)
                             * 10000000 FROM base), 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 41 = 0),
      v2 AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(SUM(o_totalprice), 2) AS total FROM base
      UNION ALL
      SELECT 2, CAST(COUNT(*) AS BIGINT), ROUND(SUM(o_totalprice), 2)
      FROM v2
      ORDER BY version""",

    // timestamp resolution replay under the pinned commit clocks:
    // 1.5e6 → v1 content, 2e6 (inclusive boundary) and 9e6 → v2
    // content — same v1/v2 replay CTEs as q73
    "q90_timestamp_travel" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
                 AS o_totalprice,
               CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 31 = 0 OR o_orderkey % 37 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT (MAX(o_orderkey) // 10000000 + 1)
                             * 10000000 FROM base), 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 41 = 0),
      v2 AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT 1500000 AS ts_ms, 1 AS version,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(SUM(o_totalprice), 2) AS total FROM base
      UNION ALL
      SELECT 2000000, 2, CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(o_totalprice), 2) FROM v2
      UNION ALL
      SELECT 9000000, 2, CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(o_totalprice), 2) FROM v2
      ORDER BY ts_ms""",

    // v2 content replay with the evolved column: survivors carry a
    // NULL tier, updated rows compute it from the ORIGINAL price,
    // inserts are tagged 'new'
    "q85_schema_evolution" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice FROM orders),
      off AS (
        SELECT (MAX(o_orderkey) // 10000000 + 1) * 10000000 AS v
        FROM base),
      v2 AS (
        SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_tier
        FROM base WHERE o_orderkey % 23 <> 0 AND o_orderkey % 29 <> 0
        UNION ALL
        SELECT o_orderkey,
               FLOOR(o_totalprice * 1.02 * 100 + 0.5) / 100,
               CASE WHEN o_totalprice > 150000 THEN 'hi' ELSE 'lo' END
        FROM base WHERE o_orderkey % 23 = 0 AND o_orderkey % 29 <> 0
        UNION ALL
        SELECT o_orderkey + off.v, 5.0, 'new'
        FROM base, off WHERE o_orderkey % 41 = 0)
      SELECT COALESCE(o_tier, 'none') AS tier,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents,
             MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
      FROM v2 GROUP BY 1 ORDER BY tier""",

    // four snapshot contents replayed from the raw table: v2 minus
    // %13 keys, v3 additionally minus %17, v4 identical to v3
    // (compaction preserves content)
    "q86_mor_deletes" -> """
      WITH base AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        FROM orders)
      SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(c) AS BIGINT) AS cents FROM base
      UNION ALL
      SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
      FROM base WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
      FROM base WHERE o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0
      UNION ALL
      SELECT 4, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT)
      FROM base WHERE o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0
      ORDER BY version""",

    // the COW commit's row-level feed replayed per change type:
    // %37 keys delete (pre-image), %31-not-%37 keys update (pre/post
    // image pair, post price = the same floor chain the engine stores),
    // %41 keys insert at the derived net-new offset
    "q87_change_feed" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice FROM orders),
      off AS (
        SELECT (MAX(o_orderkey) // 10000000 + 1) * 10000000 AS v
        FROM base),
      feed AS (
        SELECT 'delete' AS _change_type, o_orderkey AS k,
               o_totalprice AS p
        FROM base WHERE o_orderkey % 37 = 0
        UNION ALL
        SELECT 'update_preimage', o_orderkey, o_totalprice
        FROM base WHERE o_orderkey % 31 = 0 AND o_orderkey % 37 <> 0
        UNION ALL
        SELECT 'update_postimage', o_orderkey,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
        FROM base WHERE o_orderkey % 31 = 0 AND o_orderkey % 37 <> 0
        UNION ALL
        SELECT 'insert', o_orderkey + off.v, 1.0
        FROM base, off WHERE o_orderkey % 41 = 0)
      SELECT _change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(FLOOR(p * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM feed GROUP BY 1 ORDER BY _change_type""",

    // per-commit MOR feed: v2 deletes %13, v3 deletes %17 minus the
    // keys already dead at v2, v4 (compaction) emits NO group at all
    "q88_cdf_mor" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice FROM orders),
      feed AS (
        SELECT 2 AS _commit_version, o_orderkey AS k,
               o_totalprice AS p
        FROM base WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT 3, o_orderkey, o_totalprice
        FROM base WHERE o_orderkey % 17 = 0 AND o_orderkey % 13 <> 0)
      SELECT _commit_version, 'delete' AS _change_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(FLOOR(p * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM feed GROUP BY 1, 2 ORDER BY _commit_version""",

    // the DIRECT v2 aggregate — the incremental path must land on it
    "q89_incremental_mv" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
                 AS o_totalprice,
               CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 31 = 0 OR o_orderkey % 37 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT (MAX(o_orderkey) // 10000000 + 1)
                             * 10000000 FROM base), 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 41 = 0),
      v2 AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents
      FROM v2 GROUP BY 1 ORDER BY o_orderstatus""",

    // v2 replay restricted to the pruned key range
    "q74_snapshot_prune" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
                 AS o_totalprice,
               CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 31 = 0 OR o_orderkey % 37 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT (MAX(o_orderkey) // 10000000 + 1)
                             * 10000000 FROM base), 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 41 = 0),
      v2 AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(SUM(o_totalprice), 2) AS total,
             MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
      FROM v2 WHERE o_orderkey BETWEEN 1000 AND 3000""",

    // the observed metrics recomputed declaratively
    "q75_observed_metrics" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_seen,
             CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS null_qty,
             ROUND(AVG(l_extendedprice), 2) AS avg_price,
             (SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT)
              FROM lineitem) AS n_groups
      FROM lineitem""",

    "q71_table_diff" -> """
      WITH cur AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      nxt AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0
                    THEN ROUND(o_totalprice + 1.0, 2)
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM cur WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
        FROM cur WHERE o_orderkey % 13 = 0),
      d AS (
        SELECT COALESCE(c.o_orderkey, n.o_orderkey) AS k,
               CASE WHEN c.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN c.o_totalprice IS DISTINCT FROM n.o_totalprice
                      OR c.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM cur c FULL OUTER JOIN nxt n ON c.o_orderkey = n.o_orderkey)
      SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
      FROM d GROUP BY 1 ORDER BY 1""",

    // CBO must be semantically invisible: the oracle is the plain
    // three-table join over the raw parquet
    "q70_cbo_reorder" -> """
      SELECT p_brand, COUNT(*) AS n_items,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_size = 2 AND o_orderstatus = 'F'
      GROUP BY p_brand ORDER BY p_brand""",

    // the identical correlated pair — DuckDB plans its own semi/anti
    // decorrelation, so matching values prove the rewrite is sound
    "q69_exists_pair" -> """
      SELECT l1.l_suppkey,
             COUNT(*) AS n_sole_fault,
             ROUND(SUM(l1.l_extendedprice), 2) AS exposure
      FROM lineitem l1
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY l1.l_suppkey
      HAVING COUNT(*) >= 3
      ORDER BY l1.l_suppkey""",

    // the bloom runtime filter must be semantically invisible: the
    // oracle is the plain join it prunes for
    "q68_runtime_filter" -> """
      SELECT p_brand, COUNT(*) AS n_items,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size = 1
      GROUP BY 1 ORDER BY 1""",

    // compaction must be lossless: truth straight from parquet
    "q34_compacted_write" -> """
      SELECT l_linenumber, COUNT(*) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_price
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    // the Morton interleave replayed as pure div/mod arithmetic
    // (identical integer math to the engine's shift/mask form on
    // non-negative inputs); bucket = top 5 bits of the 20-bit z
    "q82_bloom_skip" -> """
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty
      FROM lineitem
      WHERE l_orderkey IN (1, 7, 4711, 29383, 999983)
      GROUP BY 1 ORDER BY 1""",

    "q56_zorder" -> {
      val zExpr = (0 until 10).map(i =>
        s"((x // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
          s"((y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      s"""
      WITH b AS (
        SELECT l_partkey % 1024 AS x, l_orderkey % 1024 AS y
        FROM lineitem),
      z AS (SELECT x, y, ($zExpr) AS zval FROM b)
      SELECT zval // 32768 AS zbucket, COUNT(*) AS n,
             MIN(x) AS x_min, MAX(x) AS x_max,
             MIN(y) AS y_min, MAX(y) AS y_max
      FROM z GROUP BY zbucket ORDER BY zbucket"""
    },

    // parity replay of the v1/v2 schema split
    "q35_schema_merge" -> """
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN '(pre-schema)'
                  ELSE o_orderpriority END AS priority,
             COUNT(*) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY 1 ORDER BY 1"""
  )
}
