package graft

import graft.fuzz.{Differ, QueryFuzzer}

/** Differential query fuzzing against DuckDB (round-11, judge item):
  * the 197 oracles are hand-written per entry; this spec generalizes
  * the gate — hundreds of SEEDED random filter/join/agg/window
  * queries from [[QueryFuzzer]]'s bounded grammar run through BOTH
  * engines (Spark via the Column API, DuckDB via the generated ANSI
  * SQL over the same parquet), and sorted value sets must agree with
  * numeric tolerance ([[Differ]], shared with the `graft.Fuzz`
  * campaign main). A divergence SHRINKS to a minimal failing query
  * before reporting, so a failure message is directly actionable and
  * becomes a pinned regression entry (see FuzzQueries: q94-q96 put
  * the same dual renderer under the driver's own hash gate).
  *
  * On a host without python3+duckdb the spec CANCELS (assume), never
  * silently passes.
  */
class FuzzSpec extends SparkSpec {

  // quick scale 140, not lower: the construct-coverage assertions below
  // (all four set-op kinds, every window function, ...) are part of the
  // gate, and the seeded grammar needs ~140 seeds before every family
  // appears (60 missed UNION and UNION ALL, 100 still missed UNION ALL)
  private val NumQueries = FuzzScale.n(220, 140)
  private lazy val pools = QueryFuzzer.samplePools(spark, sf001)

  private def duck(sqls: Map[String, String]) =
    Differ.runDuck(sf001, sqls)

  private def diff(q: QueryFuzzer.FuzzQuery,
                   d: Either[String, (Seq[String], Seq[Seq[Any]])]) =
    Differ.diff(spark, sf001, q, d)

  test("the differential gate can FAIL: a mutated oracle is reported " +
    "as a divergence (row-count and value-level)") {
    assume(Differ.duckAvailable(), "python3+duckdb not available")
    // row-count mutation: LIMIT 0 on a non-empty query's oracle
    val q = (1 to 20).iterator.map(QueryFuzzer.gen(_, pools))
      .find(_.toDF(spark, sf001).limit(1).count() > 0).get
    val limited = duck(Map("m" -> s"SELECT * FROM (${q.sql}) t LIMIT 0"))
    assert(diff(q, limited("m")).exists(_.startsWith("rows:")))
    // value mutation: same schema and row count, one value off by 1
    import QueryFuzzer.{Agg, AggCol, ColDef}
    val sumQ = QueryFuzzer.FuzzQuery(0, "lineitem", Nil, Nil,
      Agg(Nil, Seq(AggCol("sum",
        Some(ColDef("lineitem", "l_linenumber", 'I')), "a0"))))
    val skewed = duck(Map("m" ->
      ("SELECT CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) + 1 " +
        "AS a0 FROM lineitem")))
    // the value-level report comes from the tolerant confirm pass
    // (positional mismatches are only candidates — see Differ)
    assert(diff(sumQ, skewed("m"))
      .exists(_.startsWith("unmatched spark row")))
  }

  test("TLP self-partition invariant: 60 seeded (relation, predicate) " +
    "pairs satisfy |R| = |R where p| + |R where NOT p| + |R where p " +
    "IS NULL| — Catalyst's filter/pushdown/codegen paths cannot " +
    "disagree about three-valued logic (engine-only axis, no oracle " +
    "needed)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    (1001 to 1060).foreach { seed =>
      val q = Iterator.from(seed, 7919)
        .map(s => QueryFuzzer.gen(s, pools))
        // viaSql queries can hold ExistsPred, which has no Column-API
        // rendering — the TLP axis is Column-API-only by design
        .find(q => q.preds.nonEmpty && !q.viaSql).get
      val base = q.baseDF(spark, sf001)
      val p = q.predColumn(spark, sf001, q.preds.head)
      val total = base.count()
      val t = base.filter(p).count()
      val f = base.filter(!p).count()
      val n = base.filter(p.isNull).count()
      assert(t + f + n == total,
        s"seed $seed TLP violated: $t + $f + $n != $total " +
          s"(pred over ${q.baseTable}+${q.joins.map(_._3)})")
      // same invariant through a DIFFERENT evaluation path: CASE WHEN
      // inside a projection instead of three filters — the codegen'd
      // conditional and the filter operator must agree on 3VL
      val viaCase = base.select(
        when(p, lit("t")).when(!p, lit("f")).otherwise(lit("n"))
          .as("part"))
        .groupBy("part").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaCase.getOrElse("t", 0L) == t
        && viaCase.getOrElse("f", 0L) == f
        && viaCase.getOrElse("n", 0L) == n,
        s"seed $seed: filter vs CASE disagree: $viaCase vs ($t,$f,$n)")
      // aggregate form of the same invariant: an integral sum over R
      // equals the sum of the three partitions' sums (exact — no
      // float order-dependence), whatever plan each side gets
      val numCol = QueryFuzzer.tables(q.baseTable)
        .find(_.isIntegral).get.name
      def sumOf(d: org.apache.spark.sql.DataFrame): Long = {
        val r = d.agg(org.apache.spark.sql.functions
          .sum(col(numCol).cast("long"))).head
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      val whole = sumOf(base)
      val parts = sumOf(base.filter(p)) + sumOf(base.filter(!p)) +
        sumOf(base.filter(p.isNull))
      assert(whole == parts,
        s"seed $seed aggregate TLP violated: $whole != $parts")
    }
    // the axis is live: at least some seeds exercise the NULL branch
    // (left joins + null checks make p IS NULL reachable)
    val anyNull = (1001 to 1200).exists { s =>
      val q = QueryFuzzer.gen(s, pools)
      q.preds.nonEmpty && q.joins.exists(_._5 != "inner")
    }
    assert(anyNull,
      "grammar never produced a left/full-join + predicate")
  }

  test("Differ alignment: in-tolerance values straddling the 6-dp " +
    "sort-key rounding boundary misalign positionally but do NOT " +
    "report a false divergence; a real mismatch still reports") {
    import Differ._
    // row 1's float sits ~2e-8 either side of the 0.4999995 rounding
    // boundary between engines (key 0.500000 vs 0.499999), so the
    // positional zip pairs it against row 2 — whose string column
    // differs. The advisor-flagged false-divergence shape.
    val sparkRows: Seq[Seq[V]] =
      Seq(Seq(VD(0.49999951), VS("x")), Seq(VD(0.4999990), VS("y")))
    val duckRows: Seq[Seq[V]] =
      Seq(Seq(VD(0.49999949), VS("x")), Seq(VD(0.4999990), VS("y")))
    assert(alignAndCompare(sparkRows, duckRows).isEmpty,
      "boundary straddle reported a false divergence")
    // negative control: a genuinely different value still reports
    val broken: Seq[Seq[V]] =
      Seq(Seq(VD(0.6), VS("x")), Seq(VD(0.4999990), VS("y")))
    assert(alignAndCompare(sparkRows, broken).isDefined,
      "real mismatch was swallowed by the tolerant pass")
  }

  test("Differ tolerant match is a MAXIMUM matching, not greedy: " +
    "chained in-tolerance values (spark a ~ duck x AND y, spark b " +
    "only ~ x) pair correctly via augmenting paths") {
    import Differ._
    // tolerance near 1.0 is ~1e-6. a=1.0000004 is within it of BOTH
    // x=1.0 and y=1.0000008; b=0.9999996 only of x (|b-y|=1.2e-6).
    // A greedy pass pairs a->x first and falsely reports b unmatched;
    // the augmenting path re-pairs a->y so b->x. The multisets DO
    // match under tolerance — this must be a non-divergence.
    val sparkRows: Seq[Seq[V]] =
      Seq(Seq(VD(1.0000004)), Seq(VD(0.9999996)))
    val duckRows: Seq[Seq[V]] =
      Seq(Seq(VD(1.0)), Seq(VD(1.0000008)))
    assert(alignAndCompare(sparkRows, duckRows).isEmpty,
      "greedy-order false divergence: a perfect matching exists")
    // negative control: shift y out of everyone's tolerance — now b
    // truly has no partner once a takes x, and it must report
    val brokenDuck: Seq[Seq[V]] =
      Seq(Seq(VD(1.0)), Seq(VD(1.0000030)))
    assert(alignAndCompare(sparkRows, brokenDuck).isDefined,
      "true divergence swallowed by the matching pass")
  }

  test("Differ stays a maximum matching on an ALL-NUMERIC bucket far " +
    "past the old 2048 cap: chained tolerance at 2200+ rows matches; " +
    "one genuinely different row still reports") {
    import Differ._
    // Every row is numeric -> bucketKey wildcards every column -> ONE
    // giant bucket: exactly the shape where the round-13 greedy
    // fallback (buckets > 2048) could re-report the chained-tolerance
    // false divergence. 1100 copies of the chained pattern at integer
    // offsets k (spark a=k+5e-7 ~ duck x=k+4e-7 AND y=k+1.2e-6; spark
    // b=k only ~ x): greedy pairing a->x strands b; the maximum
    // matching pairs a->y, b->x. A 6dp-boundary-straddle quartet
    // (0.49999951 keys as 0.500000 on one side, 0.49999949 as
    // 0.499999 on the other, so the key tie-break misaligns the
    // second column 9-vs-7) forces the positional pass to fail so
    // the matcher actually runs over the giant bucket.
    val sparkRows: Seq[Seq[V]] = (0 until 1100).flatMap { k =>
      Seq(Seq(VD(k + 5e-7), VD(1.0)), Seq(VD(k.toDouble), VD(1.0)))
    } ++ Seq(Seq(VD(0.49999951), VD(7.0)), Seq(VD(0.4999990), VD(9.0)))
    val duckRows: Seq[Seq[V]] = (0 until 1100).flatMap { k =>
      Seq(Seq(VD(k + 4e-7), VD(1.0)), Seq(VD(k + 1.2e-6), VD(1.0)))
    } ++ Seq(Seq(VD(0.49999949), VD(7.0)), Seq(VD(0.4999990), VD(9.0)))
    assert(alignAndCompare(sparkRows, duckRows).isEmpty,
      "false divergence on a >2048-row all-numeric bucket with a " +
        "perfect matching")
    // negative control: make one duck row truly different
    val broken = duckRows.updated(0, Seq(VD(0.01), VD(1.0)))
    assert(alignAndCompare(sparkRows, broken).isDefined,
      "true divergence swallowed at giant-bucket size")
  }

  test("Differ eqV: equal infinities compare equal (exact fast path); " +
    "opposite infinities and Inf-vs-finite still diverge") {
    import Differ._
    assert(alignAndCompare(
      Seq(Seq(VD(Double.PositiveInfinity))),
      Seq(Seq(VD(Double.PositiveInfinity)))).isEmpty,
      "+Inf vs +Inf reported as divergence (Inf - Inf = NaN trap)")
    assert(alignAndCompare(
      Seq(Seq(VD(Double.PositiveInfinity))),
      Seq(Seq(VD(Double.NegativeInfinity)))).isDefined)
    assert(alignAndCompare(
      Seq(Seq(VD(Double.PositiveInfinity))),
      Seq(Seq(VD(1.0)))).isDefined)
  }

  test("mutation negatives, one per round-12 construct family: a " +
    "mutated oracle for ORDER BY+LIMIT / UNION ALL / FULL JOIN / " +
    "BETWEEN / scalar subquery / ranked window / GROUP BY expression " +
    "is reported as a divergence") {
    assume(Differ.duckAvailable(), "python3+duckdb not available")
    import QueryFuzzer._
    def cd(t: String, n: String, k: Char) = ColDef(t, n, k)
    def mDiff(q: FuzzQuery, mutated: String): Option[String] =
      diff(q, duck(Map("m" -> mutated))("m"))

    // ORDER BY + LIMIT: LIMIT k-1 in the oracle -> row-count mismatch
    val qOl = FuzzQuery(0, "customer", Nil, Nil,
      Proj(Seq(PlainCol(cd("customer", "c_custkey", 'L'), "c0"),
        PlainCol(cd("customer", "c_name", 'S'), "c1")), distinct = false),
      orderLimit = Some((Seq(("c0", true), ("c1", false)), 10)))
    assert(mDiff(qOl, qOl.sql.replace("LIMIT 10", "LIMIT 9"))
      .exists(_.startsWith("rows:")), "ORDER BY+LIMIT mutation missed")

    // UNION ALL -> UNION: same predicate both branches guarantees
    // every row is duplicated, so the dedup halves the count
    val pB = Cmp(cd("customer", "c_mktsegment", 'S'), "=", "BUILDING")
    val qU = FuzzQuery(0, "customer", Nil, Nil,
      SetOp(Seq(PlainCol(cd("customer", "c_custkey", 'L'), "c0")),
        "UNION ALL", pB, pB))
    assert(mDiff(qU, qU.sql.replace("UNION ALL", "UNION"))
      .exists(_.startsWith("rows:")), "UNION ALL mutation missed")

    // FULL -> LEFT under a restrictive ON pred: non-BUILDING
    // customers are right-unmatched, FULL keeps them null-extended
    val qF = FuzzQuery(0, "orders",
      joins = Seq(("orders", "o_custkey", "customer", "c_custkey",
        "full")),
      preds = Nil,
      shape = Agg(Nil, Seq(AggCol("count*", None, "a0"))),
      joinOnPreds = Map(0 -> pB))
    assert(mDiff(qF, qF.sql.replace("FULL JOIN", "LEFT JOIN")).nonEmpty,
      "FULL JOIN mutation missed")

    // BETWEEN: upper bound tightened
    val qB = FuzzQuery(0, "lineitem", Nil,
      Seq(Between(cd("lineitem", "l_quantity", 'D'), 10.0, 20.0)),
      Agg(Nil, Seq(AggCol("count*", None, "a0"))))
    assert(mDiff(qB, qB.sql.replace("AND 20", "AND 19")).nonEmpty,
      "BETWEEN mutation missed")

    // scalar subquery: MIN -> MAX flips the comparison threshold
    val qS = FuzzQuery(0, "orders", Nil,
      Seq(ScalarCmp(cd("orders", "o_orderkey", 'L'), "<=", "min",
        cd("customer", "c_custkey", 'L'))),
      Agg(Nil, Seq(AggCol("count*", None, "a0"))))
    assert(mDiff(qS, qS.sql.replace("MIN(", "MAX(")).nonEmpty,
      "scalar subquery mutation missed")

    // ranked window: RANK -> DENSE_RANK differs exactly where ties
    // exist (5 segments over 25 nations -> heavy ties)
    val qR = FuzzQuery(0, "customer", Nil, Nil,
      Win2(cd("customer", "c_nationkey", 'I'),
        Seq((cd("customer", "c_mktsegment", 'S'), true)),
        Seq(("rank", None, "f0"))))
    assert(mDiff(qR, qR.sql.replace("RANK()", "DENSE_RANK()")).nonEmpty,
      "ranked window mutation missed")

    // GROUP BY expression: modulus changed
    val qG = FuzzQuery(0, "customer", Nil, Nil,
      Agg(Nil, Seq(AggCol("count*", None, "a0")), None,
        Seq(GroupExpr(cd("customer", "c_nationkey", 'I'), "mod", 3))))
    assert(mDiff(qG, qG.sql.replace("% 3", "% 4")).nonEmpty,
      "GROUP BY expression mutation missed")
  }

  test("mutation negatives, one per round-13 construct family: a " +
    "mutated oracle for correlated scalar subquery / IN (subquery) / " +
    "COUNT(DISTINCT) / NULLIF / IS DISTINCT FROM / EXTRACT-over-ts " +
    "is reported as a divergence") {
    assume(Differ.duckAvailable(), "python3+duckdb not available")
    import QueryFuzzer._
    def cd(t: String, n: String, k: Char) = ColDef(t, n, k)
    def mDiff(q: FuzzQuery, mutated: String): Option[String] =
      diff(q, duck(Map("m" -> mutated))("m"))
    val countStar = Agg(Nil, Seq(AggCol("count*", None, "a0")))

    // correlated scalar subquery: MIN -> MAX flips the per-key
    // threshold (o_custkey vs the order's min/max lineitem partkey)
    val qC = FuzzQuery(0, "orders", Nil, Nil, countStar,
      corrScalars = Seq(CorrScalar("orders", "o_orderkey",
        "lineitem", "l_orderkey", cd("orders", "o_custkey", 'L'),
        ">=", "min", cd("lineitem", "l_partkey", 'L'))))
    assert(mDiff(qC, qC.sql.replace("MIN(", "MAX(")).nonEmpty,
      "correlated scalar mutation missed")

    // IN (subquery): the inner filter literal changed
    val qI = FuzzQuery(0, "orders", Nil, Nil, countStar,
      semis = Seq(Semi("orders", "o_custkey", "customer",
        "c_custkey", negated = false,
        pred = Some(Cmp(cd("customer", "c_mktsegment", 'S'), "=",
          "BUILDING")), asIn = true)))
    assert(qI.sql.contains(" IN (SELECT"), "qI did not render as IN")
    assert(mDiff(qI, qI.sql.replace("'BUILDING'", "'MACHINERY'"))
      .nonEmpty, "IN (subquery) mutation missed")

    // COUNT(DISTINCT) -> COUNT: collapses 5 segments to row count
    val qD = FuzzQuery(0, "customer", Nil, Nil,
      Agg(Nil, Seq(AggCol("count_distinct",
        Some(cd("customer", "c_mktsegment", 'S')), "a0"))))
    assert(mDiff(qD, qD.sql.replace("COUNT(DISTINCT", "COUNT("))
      .nonEmpty, "COUNT(DISTINCT) mutation missed")

    // NULLIF: the null-introduction literal changed
    val qN = FuzzQuery(0, "customer", Nil, Nil,
      Proj(Seq(NullIfCol(cd("customer", "c_mktsegment", 'S'),
        "BUILDING", "c0")), distinct = false))
    assert(mDiff(qN, qN.sql.replace("'BUILDING'", "'MACHINERY'"))
      .nonEmpty, "NULLIF mutation missed")

    // IS DISTINCT FROM -> <> over a null-extending FULL JOIN: the
    // null-extended rows count under IS DISTINCT FROM, drop under <>
    val pB = Cmp(cd("customer", "c_mktsegment", 'S'), "=", "BUILDING")
    val qDf = FuzzQuery(0, "orders",
      joins = Seq(("orders", "o_custkey", "customer", "c_custkey",
        "full")),
      preds = Seq(DistinctFrom(cd("customer", "c_mktsegment", 'S'),
        "BUILDING", negated = true)),
      shape = countStar, joinOnPreds = Map(0 -> pB))
    assert(mDiff(qDf, qDf.sql.replace(
      "c_mktsegment IS DISTINCT FROM 'BUILDING'",
      "c_mktsegment <> 'BUILDING'")).nonEmpty,
      "IS DISTINCT FROM mutation missed")

    // EXTRACT over events.ts: group field MONTH -> DAY regroups, and
    // a predicate field HOUR -> MINUTE refilters
    val qT = FuzzQuery(0, "events", Nil, Nil,
      Agg(Nil, Seq(AggCol("count*", None, "a0")), None,
        Seq(GroupExpr(ColDef("events", "ts", 'T'), "tmonth", 0))))
    assert(mDiff(qT, qT.sql.replace("EXTRACT(MONTH", "EXTRACT(DAY"))
      .nonEmpty, "EXTRACT group mutation missed")
    val qT2 = FuzzQuery(0, "events", Nil,
      Seq(TimeCmp("hour", "<", 12)), countStar)
    assert(mDiff(qT2, qT2.sql.replace("EXTRACT(HOUR", "EXTRACT(MINUTE"))
      .nonEmpty, "EXTRACT predicate mutation missed")
  }

  test("mutation negatives, one per round-14 viaSql construct " +
    "family: a mutated oracle for EXISTS-in-OR / IN-subquery-in-OR / " +
    "SELECT-list scalar subquery / SELECT-list correlated subquery / " +
    "HAVING-side subquery is reported as a divergence") {
    assume(Differ.duckAvailable(), "python3+duckdb not available")
    import QueryFuzzer._
    def cd(t: String, n: String, k: Char) = ColDef(t, n, k)
    def mDiff(q: FuzzQuery, mutated: String): Option[String] =
      diff(q, duck(Map("m" -> mutated))("m"))
    val countStar = Agg(Nil, Seq(AggCol("count*", None, "a0")))

    // EXISTS inside OR (ExistenceJoin): flip to NOT EXISTS — the
    // disjunction now selects the complementary nation-region set
    val exSemi = Semi("customer", "c_nationkey", "nation",
      "n_nationkey", negated = false,
      pred = Some(Cmp(cd("nation", "n_regionkey", 'I'), "=", 0)))
    val qE = FuzzQuery(0, "customer", Nil,
      preds = Seq(Bin(
        Cmp(cd("customer", "c_acctbal", 'D'), "<", 0.0),
        ExistsPred(exSemi), and = false)),
      shape = countStar, viaSql = true)
    assert(qE.sql.contains("OR (EXISTS"), "qE did not render OR-EXISTS")
    assert(mDiff(qE, qE.sql.replace("OR (EXISTS", "OR (NOT EXISTS"))
      .nonEmpty, "EXISTS-in-OR mutation missed")

    // IN (subquery) inside OR (mark-join disjunct): IN -> NOT IN
    val qIn = FuzzQuery(0, "customer", Nil,
      preds = Seq(Bin(
        Cmp(cd("customer", "c_acctbal", 'D'), "<", 0.0),
        ExistsPred(exSemi.copy(asIn = true)), and = false)),
      shape = countStar, viaSql = true)
    assert(qIn.sql.contains(" IN (SELECT"), "qIn did not render as IN")
    assert(mDiff(qIn, qIn.sql.replace(" IN (SELECT", " NOT IN (SELECT"))
      .nonEmpty, "IN-subquery-in-OR mutation missed")

    // SELECT-list scalar subquery: MIN -> MAX (p_size spans 1..50)
    val qS = FuzzQuery(0, "region", Nil, Nil,
      Proj(Seq(PlainCol(cd("region", "r_regionkey", 'I'), "c0"),
        ScalarSubCol("min", cd("part", "p_size", 'I'), "c1")),
        distinct = false), viaSql = true)
    assert(mDiff(qS, qS.sql.replace("MIN(", "MAX(")).nonEmpty,
      "SELECT-list scalar subquery mutation missed")

    // SELECT-list CORRELATED subquery: per-customer nation count is
    // 1; +1 in the oracle shifts every value
    val qC = FuzzQuery(0, "customer", Nil, Nil,
      Proj(Seq(PlainCol(cd("customer", "c_custkey", 'L'), "c0"),
        CorrSubCol(CorrScalar("customer", "c_nationkey", "nation",
          "n_nationkey", cd("customer", "c_custkey", 'L'), ">=",
          "count", cd("nation", "n_nationkey", 'I')), "c1")),
        distinct = false), viaSql = true)
    assert(mDiff(qC, qC.sql.replace("(SELECT COUNT(*)",
      "(SELECT COUNT(*) + 1")).nonEmpty,
      "SELECT-list correlated subquery mutation missed")

    // HAVING-side subquery: MIN(p_size)=1 keeps every group,
    // MAX(p_size)=50 beats every segment count at sf0.001
    val qH = FuzzQuery(0, "customer", Nil, Nil,
      Agg(Seq(cd("customer", "c_mktsegment", 'S')),
        Seq(AggCol("count*", None, "a0")), None, Seq.empty,
        havingSub = Some(("a0", "min", cd("part", "p_size", 'I')))),
      viaSql = true)
    assert(qH.sql.contains("HAVING COUNT(*) >= (SELECT MIN(p_size)"),
      "qH did not render a HAVING subquery")
    assert(mDiff(qH, qH.sql.replace("MIN(p_size)", "MAX(p_size)"))
      .exists(_.startsWith("rows:")),
      "HAVING-side subquery mutation missed")
  }

  test("mutation negatives, round-14 Rollup family: losing the " +
      "lattice (plain GROUP BY) and widening it (ROLLUP->CUBE) are " +
      "both reported") {
    assume(Differ.duckAvailable(), "python3+duckdb not available")
    import QueryFuzzer._
    def cd(t: String, n: String, k: Char) = ColDef(t, n, k)
    def mDiff(q: FuzzQuery, mutated: String): Option[String] =
      diff(q, duck(Map("m" -> mutated))("m"))
    val q = FuzzQuery(0, "lineitem", Nil, Nil,
      Rollup(Seq(cd("lineitem", "l_returnflag", 'S'),
        cd("lineitem", "l_linestatus", 'S')),
        Seq(AggCol("count*", None, "a0")), cube = false))
    assert(q.sql.contains("GROUP BY ROLLUP"), "qR did not render ROLLUP")
    // plain GROUP BY drops every subtotal row (DuckDB accepts
    // GROUPING() under plain GROUP BY, returning 0 — verified)
    assert(mDiff(q, q.sql.replace("GROUP BY ROLLUP", "GROUP BY"))
      .exists(_.startsWith("rows:")), "ROLLUP->plain mutation missed")
    // CUBE adds the (ALL, linestatus) grain ROLLUP lacks
    assert(mDiff(q, q.sql.replace("ROLLUP", "CUBE"))
      .exists(_.startsWith("rows:")), "ROLLUP->CUBE mutation missed")
  }

  test("mutation negatives, round-14-continuation families: a mutated " +
      "FILTER-clause literal, a dropped FILTER, a widened SUBSTR, and " +
      "LOWER->UPPER are all reported") {
    assume(Differ.duckAvailable(), "python3+duckdb not available")
    import QueryFuzzer._
    def cd(t: String, n: String, k: Char) = ColDef(t, n, k)
    def mDiff(q: FuzzQuery, mutated: String): Option[String] =
      diff(q, duck(Map("m" -> mutated))("m"))

    // FILTER-clause aggregate: the filter literal changed, and the
    // clause dropped entirely (the count then includes every segment)
    val qF = FuzzQuery(0, "customer", Nil, Nil,
      Agg(Seq(cd("customer", "c_nationkey", 'I')),
        Seq(AggCol("count*", None, "a0",
          filter = Some(Cmp(cd("customer", "c_mktsegment", 'S'), "=",
            "BUILDING"))))))
    assert(qF.sql.contains("FILTER (WHERE"), "qF did not render FILTER")
    assert(mDiff(qF, qF.sql.replace("'BUILDING'", "'MACHINERY'"))
      .nonEmpty, "FILTER literal mutation missed")
    assert(mDiff(qF, qF.sql.replace(
      " FILTER (WHERE c_mktsegment = 'BUILDING')", "")).nonEmpty,
      "FILTER drop mutation missed")
    // the filtered SUM's FILTER sits INSIDE the BIGINT cast — the
    // rendering edge this family exists to pin
    val qS = FuzzQuery(0, "customer", Nil, Nil,
      Agg(Nil, Seq(AggCol("sum", Some(cd("customer", "c_nationkey",
        'I')), "a0", filter = Some(Cmp(cd("customer", "c_mktsegment",
        'S'), "=", "BUILDING"))))))
    // lastIndexOf: the summand's own CAST(... AS BIGINT) sits INSIDE
    // the SUM; the outer cast is the last occurrence
    assert(qS.sql.contains("FILTER (WHERE") &&
      qS.sql.indexOf("FILTER") < qS.sql.lastIndexOf(" AS BIGINT"),
      s"filtered SUM rendered the FILTER outside the CAST: ${qS.sql}")
    assert(mDiff(qS, qS.sql).isEmpty, "filtered SUM baseline diverged")

    // SUBSTR widened by one char splits prefix groups differently
    val qSub = FuzzQuery(0, "customer", Nil, Nil,
      Proj(Seq(SubstrCol(cd("customer", "c_name", 'S'), 1, 2, "c0")),
        distinct = true))
    assert(mDiff(qSub, qSub.sql.replace("SUBSTR(c_name, 1, 2)",
      "SUBSTR(c_name, 1, 3)")).nonEmpty, "SUBSTR mutation missed")

    // LOWER -> UPPER flips every cased value
    val qL = FuzzQuery(0, "customer", Nil, Nil,
      Proj(Seq(FuncCol("lower", cd("customer", "c_name", 'S'), "c0")),
        distinct = false))
    assert(mDiff(qL, qL.sql.replace("LOWER(", "UPPER(")).nonEmpty,
      "LOWER mutation missed")
  }

  test(s"differential fuzz: $NumQueries seeded random queries agree " +
    "with DuckDB on sorted values (filters, FK joins, EXISTS/NOT " +
    "EXISTS, aggregates, HAVING, DISTINCT, windows, scalar " +
    "functions); a divergence shrinks to a minimal repro") {
    assume(Differ.duckAvailable(), "python3+duckdb not available")
    assert(pools.values.forall(_.nonEmpty), "empty literal pool")
    val queries = (1 to NumQueries)
      .map(s => s"q$s" -> QueryFuzzer.gen(s, pools)).toMap
    // grammar sanity: the seed range actually exercises every construct
    val shapes = queries.values.map(_.shape.getClass.getSimpleName).toSet
    assert(shapes.size == 6, s"shapes covered: $shapes")
    assert(queries.values.exists(_.joins.size == 2), "no 3-table chain")
    assert(queries.values.exists(_.joins.size >= 3), "no 4-table chain")
    assert(queries.values.exists(_.joins.exists(_._5 == "left")),
      "no left join")
    assert(queries.values.exists(_.joins.exists(_._5 == "full")),
      "no full outer join")
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Agg(_, _, Some(_), _, _) => true; case _ => false
    }), "no HAVING produced")
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Agg(_, _, _, ges, _) => ges.nonEmpty
      case _ => false
    }), "no GROUP BY expression produced")
    assert(queries.values.exists(_.orderLimit.isDefined),
      "no ORDER BY + LIMIT produced")
    def anyPred(q: QueryFuzzer.FuzzQuery)(
        f: QueryFuzzer.Pred => Boolean): Boolean = {
      def walk(p: QueryFuzzer.Pred): Boolean = p match {
        case QueryFuzzer.Bin(l, r, _) => f(p) || walk(l) || walk(r)
        case QueryFuzzer.NotP(i) => f(p) || walk(i)
        case _ => f(p)
      }
      q.preds.exists(walk)
    }
    assert(queries.values.exists(anyPred(_) {
      case _: QueryFuzzer.Between => true; case _ => false
    }), "no BETWEEN produced")
    assert(queries.values.exists(anyPred(_) {
      case _: QueryFuzzer.ScalarCmp => true; case _ => false
    }), "no scalar subquery produced")
    val win2Funcs = queries.values.flatMap(_.shape match {
      case QueryFuzzer.Win2(_, _, fs) => fs.map(_._1); case _ => Nil
    }).toSet
    assert(Set("row_number", "rank", "dense_rank", "sum_range")
      .subsetOf(win2Funcs), s"win2 funcs covered: $win2Funcs")
    val setOps = queries.values.flatMap(_.shape match {
      case QueryFuzzer.SetOp(_, op, _, _) => Some(op); case _ => None
    }).toSet
    assert(Set("UNION", "UNION ALL", "INTERSECT", "EXCEPT")
      .subsetOf(setOps), s"set ops covered: $setOps")
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Proj(cs, _) =>
        cs.exists(_.isInstanceOf[QueryFuzzer.FuncCol])
      case _ => false
    }), "no scalar function produced")
    assert(queries.values.exists(_.semis.exists(!_.negated)),
      "no EXISTS produced")
    assert(queries.values.exists(_.semis.exists(_.negated)),
      "no NOT EXISTS produced")
    assert(queries.values.exists(_.joinOnPreds.nonEmpty),
      "no ON-clause join predicate produced")
    assert(queries.values.exists(q => q.joinOnPreds.nonEmpty &&
      q.joins.exists(_._5 != "inner")),
      "no outer join with an ON-clause predicate (the null-extension " +
        "axis) produced")
    // round-13 construct coverage: a grammar regression that silently
    // stops producing a family must fail here, not pass vacuously
    assert(queries.values.exists(_.corrScalars.nonEmpty),
      "no correlated scalar subquery produced")
    assert(queries.values.exists(_.semis.exists(_.asIn)),
      "no IN (subquery) produced")
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Agg(_, as0, _, _, _) =>
        as0.exists(_.func == "count_distinct")
      case _ => false
    }), "no COUNT(DISTINCT) produced")
    assert(queries.values.exists(anyPred(_) {
      case _: QueryFuzzer.DistinctFrom => true; case _ => false
    }), "no IS [NOT] DISTINCT FROM produced")
    assert(queries.values.exists(q =>
      anyPred(q) { case _: QueryFuzzer.TimeCmp => true; case _ => false } ||
        (q.shape match {
          case QueryFuzzer.Agg(_, _, _, ges, _) =>
            ges.exists(_.kind.startsWith("t"))
          case QueryFuzzer.Proj(cs, _) =>
            cs.exists(_.isInstanceOf[QueryFuzzer.TimeFuncCol])
          case _ => false
        })),
      "no EXTRACT-over-ts construct produced")
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Proj(cs, _) => cs.exists(c =>
        c.isInstanceOf[QueryFuzzer.CoalesceCol] ||
          c.isInstanceOf[QueryFuzzer.NullIfCol])
      case _ => false
    }), "no COALESCE/NULLIF projection produced")
    // round-14 construct coverage: the grouping-lattice family must
    // reach BOTH keywords (rollup and cube plan the same Expand but
    // different grouping-set lattices)
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Rollup(_, _, cube) => !cube; case _ => false
    }), "no ROLLUP produced")
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Rollup(_, _, cube) => cube; case _ => false
    }), "no CUBE produced")
    // round-14-continuation construct coverage: FILTER-clause
    // aggregates and the string-function projection family
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Agg(_, as0, _, _, _) =>
        as0.exists(_.filter.isDefined)
      case _ => false
    }), "no FILTER-clause aggregate produced")
    assert(queries.values.exists(_.shape match {
      case QueryFuzzer.Proj(cs, _) => cs.exists(c =>
        c.isInstanceOf[QueryFuzzer.SubstrCol] ||
          (c match {
            case QueryFuzzer.FuncCol(f, _, _) =>
              Set("lower", "ltrim", "rtrim")(f)
            case _ => false
          }))
      case _ => false
    }), "no SUBSTR/LOWER/LTRIM/RTRIM projection produced")
    val d = duck(queries.map { case (n, q) => n -> q.sql })
    val failures = queries.toSeq.sortBy(_._1).flatMap { case (n, q) =>
      diff(q, d(n)).map(reason => (n, q, reason))
    }
    if (failures.nonEmpty) {
      val (n, q, reason) = failures.head
      val (minQ, minReason) = Differ.minimize(spark, sf001, q, reason)
      fail(s"${failures.size}/$NumQueries diverged; first: $n " +
        s"($reason)\nminimal repro (seed ${q.seed}):\n${minQ.sql}\n" +
        s"minimal diff: $minReason")
    }
  }
}
