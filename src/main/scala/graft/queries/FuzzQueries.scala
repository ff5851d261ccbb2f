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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_fuzz_join_having" -> ((s, dir) => q94.toDF(s, dir)),
    "q95_fuzz_window_leftjoin" -> ((s, dir) => q95.toDF(s, dir)),
    "q96_fuzz_scalar_distinct" -> ((s, dir) => q96.toDF(s, dir)),
    "q97_fuzz_setop_orderlimit" -> ((s, dir) => q97.toDF(s, dir)),
    "q98_fuzz_fullouter_window" -> ((s, dir) => q98.toDF(s, dir)),
    "q99_fuzz_groupexpr_scalar" -> ((s, dir) => q99.toDF(s, dir)),
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
  )
}
