package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fuzz.QueryFuzzer._

/** Fuzzer-grammar queries PINNED into the driver's oracle gate
  * (round-11): the differential fuzzer (FuzzSpec, 220 seeds vs
  * DuckDB) validates [[graft.fuzz.QueryFuzzer]]'s dual renderer in
  * `sbt test`; these three entries put the SAME renderer under the
  * driver's independent hash-compare, so the machinery that
  * generalizes the correctness gate is itself gated by it. The ASTs
  * are hand-pinned (not seed-sampled): their literals are
  * distribution constants of the TPC-H-ish generator (order statuses,
  * quantity range, segment prefixes), valid at ANY scale factor —
  * never values sampled from one SF's data (the fixed-constant trap).
  *
  * Aggregates stick to hash-stable functions (counts, integral sums,
  * min/max of stored values): the driver's compare is exact, so
  * order-dependent double summation has no place in a pinned entry —
  * that regime is covered by FuzzSpec's tolerance compare instead.
  */
object FuzzQueries {

  private def cd(t: String, n: String, k: Char) = ColDef(t, n, k)

  /** 3-table FK chain + mixed predicates + grouped aggregates +
    * HAVING through the subquery wrap.
    */
  private val q94 = FuzzQuery(0, "lineitem",
    joins = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey", "inner"),
      ("orders", "o_custkey", "customer", "c_custkey", "inner")),
    preds = Seq(
      Cmp(cd("lineitem", "l_quantity", 'D'), ">=", 25.0),
      NotP(Cmp(cd("orders", "o_orderstatus", 'S'), "=", "F"))),
    shape = Agg(
      groups = Seq(cd("customer", "c_mktsegment", 'S'),
        cd("lineitem", "l_returnflag", 'S')),
      aggs = Seq(
        AggCol("count*", None, "a0"),
        AggCol("sum", Some(cd("lineitem", "l_linenumber", 'I')), "a1"),
        AggCol("max", Some(cd("orders", "o_totalprice", 'D')), "a2"),
        AggCol("min", Some(cd("customer", "c_name", 'S')), "a3")),
      having = Some(("a0", 3L))))

  /** LEFT join + null-check predicate + partitioned window sum over
    * an integral column (BIGINT-stable in both dialects).
    */
  private val q95 = FuzzQuery(0, "customer",
    joins = Seq(
      ("customer", "c_nationkey", "nation", "n_nationkey", "left")),
    preds = Seq(
      Bin(Cmp(cd("customer", "c_acctbal", 'D'), ">", 0.0),
        NullCheck(cd("nation", "n_name", 'S'), isNull = false),
        and = true)),
    shape = Win(
      keys = Seq(cd("customer", "c_custkey", 'L'),
        cd("nation", "n_name", 'S')),
      part = cd("nation", "n_regionkey", 'I'),
      num = cd("customer", "c_custkey", 'L'),
      alias = "w"))

  /** Scalar functions + arithmetic + CASE WHEN + LIKE prefix +
    * DISTINCT projection.
    */
  private val q96 = FuzzQuery(0, "part",
    joins = Seq.empty,
    preds = Seq(
      LikePrefix(cd("part", "p_type", 'S'), "STANDARD"),
      InList(cd("part", "p_size", 'I'), Seq(1, 5, 10, 15, 20, 25))),
    shape = Proj(
      cols = Seq(
        FuncCol("upper", cd("part", "p_brand", 'S'), "c0"),
        FuncCol("length", cd("part", "p_name", 'S'), "c1"),
        ArithCol(cd("part", "p_partkey", 'L'), "*",
          cd("part", "p_size", 'I'), "c2"),
        CaseCol(Cmp(cd("part", "p_retailprice", 'D'), ">", 950.0),
          "c3")),
      distinct = true))

  /** Round-12 pins over the WIDENED grammar, same contract as
    * q94-q96: hash-stable outputs (strings/integrals only — no
    * order-dependent double summation), literals that are generator
    * distribution constants (order statuses, quantity range, segment
    * names), scalar subqueries that compare the data to its own
    * aggregate (SF-independent by construction).
    */

  /** UNION (distinct set semantics) over a shared FROM, each branch
    * with its own predicate, under an ORDER BY + LIMIT top-k whose
    * sort covers every output alias (float-free total order).
    */
  private val q97 = FuzzQuery(0, "orders",
    joins = Seq.empty,
    preds = Seq(
      Between(cd("orders", "o_totalprice", 'D'), 1000.0, 150000.0)),
    shape = SetOp(
      cols = Seq(
        PlainCol(cd("orders", "o_orderstatus", 'S'), "c0"),
        PlainCol(cd("orders", "o_orderpriority", 'S'), "c1"),
        CaseCol(Cmp(cd("orders", "o_totalprice", 'D'), ">", 100000.0),
          "c2")),
      op = "UNION",
      lp = Cmp(cd("orders", "o_orderstatus", 'S'), "<>", "F"),
      rp = LikePrefix(cd("orders", "o_orderpriority", 'S'), "1")),
    orderLimit = Some((Seq(("c0", true), ("c1", false), ("c2", true)),
      20)))

  /** FULL OUTER join made LIVE by a restrictive ON-clause predicate
    * (the harness FK edges are referentially complete, so a bare
    * outer join never null-extends), with a multi-function ordered
    * window over the null-extended result. Ties are multiset-safe:
    * the projection carries the partition and every order column, so
    * tied rows differ only in row numbers whose assigned SET is
    * order-independent.
    */
  private val q98 = FuzzQuery(0, "orders",
    joins = Seq(
      ("orders", "o_custkey", "customer", "c_custkey", "full")),
    preds = Seq.empty,
    shape = Win2(
      part = cd("customer", "c_mktsegment", 'S'),
      order = Seq((cd("orders", "o_orderkey", 'L'), true)),
      funcs = Seq(("rank", None, "f0"), ("dense_rank", None, "f1"),
        ("row_number", None, "f2"))),
    joinOnPreds = Map(0 ->
      Cmp(cd("customer", "c_mktsegment", 'S'), "=", "BUILDING")))

  /** GROUP BY over an expression (integral modulo) alongside a plain
    * key, BETWEEN + an uncorrelated scalar subquery in the WHERE,
    * HAVING, and an ORDER BY + LIMIT over the full alias set.
    */
  private val q99 = FuzzQuery(0, "lineitem",
    joins = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey", "inner")),
    preds = Seq(
      Between(cd("lineitem", "l_quantity", 'D'), 5.0, 45.0),
      ScalarCmp(cd("orders", "o_orderkey", 'L'), ">=", "min",
        cd("orders", "o_orderkey", 'L'))),
    shape = Agg(
      groups = Seq(cd("lineitem", "l_returnflag", 'S')),
      aggs = Seq(
        AggCol("count*", None, "a0"),
        AggCol("sum", Some(cd("lineitem", "l_linenumber", 'I')), "a1"),
        AggCol("max", Some(cd("orders", "o_orderpriority", 'S')),
          "a2")),
      having = Some(("a0", 2L)),
      groupExprs = Seq(
        GroupExpr(cd("lineitem", "l_linenumber", 'I'), "mod", 3))),
    orderLimit = Some((Seq(("g0", true), ("g1", true), ("a0", false),
      ("a1", true), ("a2", true)), 15)))

  /** Round-13 pins over the widened grammar, same contract: literals
    * are generator distribution constants (region keys 0-4, TPC-H's
    * 1-7 lineitems/order and ~constant lineitems/supplier ratio,
    * segment/status names, the 2024 event-time span), outputs are
    * hash-stable (counts, distinct counts, strings, stored values —
    * no order-dependent double summation).
    */

  /** CORRELATED scalar subquery (per-supplier lineitem COUNT vs the
    * supplier's acctbal — both distributions SF-invariant) + IN
    * (subquery) with an inner filter + COUNT(DISTINCT) + a mod group
    * expression, under an ORDER BY + LIMIT over the full alias set.
    */
  private val q100 = FuzzQuery(0, "supplier",
    joins = Seq.empty,
    preds = Seq.empty,
    shape = Agg(
      groups = Seq(cd("supplier", "s_nationkey", 'I')),
      aggs = Seq(
        AggCol("count*", None, "a0"),
        AggCol("count_distinct", Some(cd("supplier", "s_name", 'S')),
          "a1"),
        AggCol("min", Some(cd("supplier", "s_name", 'S')), "a2")),
      having = None,
      groupExprs = Seq(
        GroupExpr(cd("supplier", "s_suppkey", 'L'), "mod", 4))),
    semis = Seq(Semi("supplier", "s_nationkey", "nation",
      "n_nationkey", negated = false,
      pred = Some(Cmp(cd("nation", "n_regionkey", 'I'), "<>", 2)),
      asIn = true)),
    orderLimit = Some((Seq(("g0", true), ("g1", true), ("a0", false),
      ("a1", true), ("a2", true)), 25)),
    corrScalars = Seq(CorrScalar("supplier", "s_suppkey",
      "lineitem", "l_suppkey", cd("supplier", "s_acctbal", 'D'),
      ">=", "count", cd("lineitem", "l_linenumber", 'I'))))

  /** COALESCE + NULLIF + IS DISTINCT FROM over a FULL JOIN made
    * null-extending by a restrictive ON predicate — every
    * three-valued-logic edge of the round-13 grammar in one DISTINCT
    * projection under a float-free ORDER BY + LIMIT.
    */
  private val q101 = FuzzQuery(0, "orders",
    joins = Seq(
      ("orders", "o_custkey", "customer", "c_custkey", "full")),
    preds = Seq(
      DistinctFrom(cd("customer", "c_mktsegment", 'S'), "AUTOMOBILE",
        negated = true)),
    shape = Proj(
      cols = Seq(
        CoalesceCol(cd("customer", "c_mktsegment", 'S'), "NONE", "c0"),
        NullIfCol(cd("orders", "o_orderstatus", 'S'), "F", "c1"),
        CaseCol(NullCheck(cd("customer", "c_custkey", 'L'),
          isNull = true), "c2"),
        PlainCol(cd("orders", "o_orderpriority", 'S'), "c3")),
      distinct = true),
    orderLimit = Some((Seq(("c0", true), ("c1", true), ("c2", false),
      ("c3", true)), 30)),
    joinOnPreds = Map(0 ->
      Cmp(cd("customer", "c_mktsegment", 'S'), "=", "BUILDING")))

  /** The events.ts extraction family: EXTRACT predicates (hour,
    * minute — generator constants over the 2024 span), a GROUP BY
    * over EXTRACT(DAY), and distinct-count aggregation — all BIGINT
    * outputs, timestamps never surfacing raw.
    */
  private val q102 = FuzzQuery(0, "events",
    joins = Seq.empty,
    preds = Seq(
      TimeCmp("hour", "<", 12),
      TimeCmp("minute", ">=", 5)),
    shape = Agg(
      groups = Seq(cd("events", "event_type", 'S')),
      aggs = Seq(
        AggCol("count*", None, "a0"),
        AggCol("count_distinct", Some(cd("events", "user_id", 'L')),
          "a1"),
        AggCol("max", Some(cd("events", "props", 'S')), "a2")),
      having = Some(("a0", 1L)),
      groupExprs = Seq(
        GroupExpr(ColDef("events", "ts", 'T'), "tday", 0))),
    orderLimit = Some((Seq(("g0", true), ("g1", true), ("a0", false),
      ("a1", true), ("a2", true)), 40)))

  /** Round-14 viaSql family: EXISTS inside an OR disjunction —
    * Catalyst plans an ExistenceJoin (marker-joined disjunct), not
    * the left_semi of the conjunctive axis; DuckDB a mark join. The
    * Spark side executes the SAME shared-dialect SQL text through
    * spark.sql (the Column API cannot express a non-conjunctive
    * EXISTS), so the driver's gate compares two PLANNERS over one
    * string. Constants: acctbal sign, region bound — SF-invariant.
    */
  private val q103 = FuzzQuery(0, "customer",
    joins = Seq.empty,
    preds = Seq(Bin(
      Cmp(cd("customer", "c_acctbal", 'D'), "<", 0.0),
      ExistsPred(Semi("customer", "c_nationkey", "nation",
        "n_nationkey", negated = false,
        pred = Some(Cmp(cd("nation", "n_regionkey", 'I'), "<=", 1)))),
      and = false)),
    shape = Agg(
      groups = Seq(cd("customer", "c_mktsegment", 'S')),
      aggs = Seq(
        AggCol("count*", None, "a0"),
        AggCol("min", Some(cd("customer", "c_name", 'S')), "a1"),
        AggCol("max", Some(cd("customer", "c_custkey", 'L')), "a2"))),
    orderLimit = Some((Seq(("g0", true), ("a0", false), ("a1", true),
      ("a2", true)), 25)),
    viaSql = true)

  /** Round-14 viaSql family: scalar subqueries IN THE SELECT LIST —
    * an uncorrelated MIN and a correlated per-order customer MAX
    * (Catalyst decorrelates to a left outer aggregate join). All
    * integral outputs under a unique-key ORDER BY + LIMIT.
    */
  private val q104 = FuzzQuery(0, "orders",
    joins = Seq.empty,
    preds = Seq(Cmp(cd("orders", "o_orderstatus", 'S'), "<>", "P")),
    shape = Proj(
      cols = Seq(
        PlainCol(cd("orders", "o_orderkey", 'L'), "c0"),
        ScalarSubCol("min", cd("part", "p_size", 'I'), "c1"),
        CorrSubCol(CorrScalar("orders", "o_custkey", "customer",
          "c_custkey", cd("orders", "o_orderkey", 'L'), ">=", "max",
          cd("customer", "c_nationkey", 'I')), "c2")),
      distinct = false),
    orderLimit = Some((Seq(("c0", true), ("c1", true), ("c2", true)),
      40)),
    viaSql = true)

  /** Round-14 viaSql family: TRUE HAVING with a scalar-subquery
    * bound — orders kept when their lineitem count reaches
    * MAX(n_regionkey) = 4 (both distributions SF-invariant: 1..7
    * lines per order, 5 regions), a filter that genuinely bites at
    * every scale factor.
    */
  private val q105 = FuzzQuery(0, "lineitem",
    joins = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey", "inner")),
    preds = Seq.empty,
    shape = Agg(
      groups = Seq(cd("orders", "o_orderkey", 'L')),
      aggs = Seq(
        AggCol("count*", None, "a0"),
        AggCol("sum", Some(cd("lineitem", "l_linenumber", 'I')),
          "a1")),
      having = None,
      groupExprs = Seq.empty,
      havingSub = Some(("a0", "max",
        cd("nation", "n_regionkey", 'I')))),
    orderLimit = Some((Seq(("g0", true), ("a0", false), ("a1", true)),
      50)),
    viaSql = true)

  /** Round-14 Rollup family pin: CUBE over (returnflag, linestatus)
    * with GROUPING() bits, a join and an anti-selective predicate,
    * count/integral-sum/max aggregates, total-order ORDER BY over
    * every alias. The full lattice is 12 rows, under the LIMIT — the
    * pin is fully deterministic at every SF. Exercises the
    * empty-input-divergence wrapper (a no-op here: input non-empty).
    */
  private val q106 = FuzzQuery(0, "lineitem",
    joins = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey", "inner")),
    preds = Seq(Cmp(cd("orders", "o_orderpriority", 'S'), "<>",
      "1-URGENT")),
    shape = Rollup(
      groups = Seq(cd("lineitem", "l_returnflag", 'S'),
        cd("lineitem", "l_linestatus", 'S')),
      aggs = Seq(
        AggCol("count*", None, "a0"),
        AggCol("sum", Some(cd("lineitem", "l_linenumber", 'I')), "a1"),
        AggCol("max", Some(cd("orders", "o_orderkey", 'L')), "a2")),
      cube = true),
    orderLimit = Some((Seq(("g0", true), ("g1", true), ("gb0", true),
      ("gb1", true), ("a0", false), ("a1", true), ("a2", true)), 50)))

  /** Round-14-continuation FILTER-aggregate pin: grouped aggregation
    * over a lineitem⋈orders join where every aggregate kind that can
    * carry a FILTER does — COUNT(*), the BIGINT-cast integral SUM
    * (FILTER inside the cast, the rendering edge), and
    * COUNT(DISTINCT) — each with a different leaf predicate. DuckDB
    * runs the literal SQL:2003 clause; Spark runs the when()-wrapped
    * conditional aggregation. Output is integral-only (float-free
    * total order), 3 groups at every SF — fully deterministic.
    */
  private val q107 = FuzzQuery(0, "lineitem",
    joins = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey", "inner")),
    preds = Seq.empty,
    shape = Agg(
      groups = Seq(cd("lineitem", "l_returnflag", 'S')),
      aggs = Seq(
        AggCol("count*", None, "a0",
          filter = Some(Cmp(cd("orders", "o_orderpriority", 'S'), "=",
            "1-URGENT"))),
        AggCol("sum", Some(cd("lineitem", "l_linenumber", 'I')), "a1",
          filter = Some(Cmp(cd("lineitem", "l_quantity", 'D'), "<",
            25.0))),
        AggCol("count_distinct",
          Some(cd("orders", "o_orderpriority", 'S')), "a2",
          filter = Some(Cmp(cd("lineitem", "l_linenumber", 'I'), ">",
            2))))),
    orderLimit = Some((Seq(("g0", true), ("a0", false), ("a1", true),
      ("a2", true)), 50)))

  /** Round-14-continuation string-function pin: the dialect-shared
    * string surface in one projection — SUBSTR with positive args
    * (mid-string AND prefix), LOWER, LTRIM — over a customer⋈nation
    * join with a selective predicate. All-string output, total-order
    * ORDER BY over every alias, LIMIT 40: deterministic at every SF.
    */
  private val q108 = FuzzQuery(0, "customer",
    joins = Seq(
      ("customer", "c_nationkey", "nation", "n_nationkey", "inner")),
    preds = Seq(Cmp(cd("customer", "c_mktsegment", 'S'), "<>",
      "BUILDING")),
    shape = Proj(Seq(
      SubstrCol(cd("customer", "c_name", 'S'), 10, 4, "c0"),
      FuncCol("lower", cd("customer", "c_mktsegment", 'S'), "c1"),
      SubstrCol(cd("nation", "n_name", 'S'), 1, 3, "c2"),
      FuncCol("ltrim", cd("customer", "c_name", 'S'), "c3")),
      distinct = false),
    orderLimit = Some((Seq(("c0", true), ("c1", true), ("c2", false),
      ("c3", true)), 40)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_fuzz_join_having" -> ((s, dir) => q94.toDF(s, dir)),
    "q95_fuzz_window_leftjoin" -> ((s, dir) => q95.toDF(s, dir)),
    "q96_fuzz_scalar_distinct" -> ((s, dir) => q96.toDF(s, dir)),
    "q97_fuzz_setop_orderlimit" -> ((s, dir) => q97.toDF(s, dir)),
    "q98_fuzz_fullouter_window" -> ((s, dir) => q98.toDF(s, dir)),
    "q99_fuzz_groupexpr_scalar" -> ((s, dir) => q99.toDF(s, dir)),
    "q100_fuzz_corr_in_subquery" -> ((s, dir) => q100.toDF(s, dir)),
    "q101_fuzz_tvl_fullouter" -> ((s, dir) => q101.toDF(s, dir)),
    "q102_fuzz_time_extract" -> ((s, dir) => q102.toDF(s, dir)),
    "q103_fuzz_existence_join" -> ((s, dir) => q103.toDF(s, dir)),
    "q104_fuzz_select_subqueries" -> ((s, dir) => q104.toDF(s, dir)),
    "q105_fuzz_having_subquery" -> ((s, dir) => q105.toDF(s, dir)),
    "q106_fuzz_rollup_cube" -> ((s, dir) => q106.toDF(s, dir)),
    "q107_fuzz_filter_agg" -> ((s, dir) => q107.toDF(s, dir)),
    "q108_fuzz_string_funcs" -> ((s, dir) => q108.toDF(s, dir)),
  )

  /** The oracle SQL IS the renderer's other output — one AST, two
    * engines, the fuzzer contract under the driver's gate.
    */
  val oracles: Map[String, String] = Map(
    "q94_fuzz_join_having" -> q94.sql,
    "q95_fuzz_window_leftjoin" -> q95.sql,
    "q96_fuzz_scalar_distinct" -> q96.sql,
    "q97_fuzz_setop_orderlimit" -> q97.sql,
    "q98_fuzz_fullouter_window" -> q98.sql,
    "q99_fuzz_groupexpr_scalar" -> q99.sql,
    "q100_fuzz_corr_in_subquery" -> q100.sql,
    "q101_fuzz_tvl_fullouter" -> q101.sql,
    "q102_fuzz_time_extract" -> q102.sql,
    "q103_fuzz_existence_join" -> q103.sql,
    "q104_fuzz_select_subqueries" -> q104.sql,
    "q105_fuzz_having_subquery" -> q105.sql,
    "q106_fuzz_rollup_cube" -> q106.sql,
    "q107_fuzz_filter_agg" -> q107.sql,
    "q108_fuzz_string_funcs" -> q108.sql,
  )
}
