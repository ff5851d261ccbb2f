package graft.fuzz

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded differential query fuzzer (round-11): generates random
  * filter/join/aggregate/window queries over the harness tables from
  * a bounded grammar — exactly the relational surface the 194
  * hand-written oracles gate — and renders each query BOTH ways:
  *
  *   - a Spark `DataFrame` plan built through the Column API (the way
  *    every graft query is built), and
  *   - an ANSI SQL string an independent engine (DuckDB, via
  *    `tools/fuzz_duckdb.py`) replays over the same parquet.
  *
  * FuzzSpec runs hundreds of seeds and compares sorted value sets
  * with numeric tolerance; a divergence shrinks to a minimal failing
  * query (drop predicates/output columns one at a time) and becomes a
  * pinned regression. The generator is deliberately DETERMINISTIC per
  * seed — literal pools are sampled from the data with a stable
  * order, so a seed that passes once passes forever on the same data.
  *
  * Grammar bounds (kept inside what both dialects define identically):
  * inner/left equi-joins along the FK graph, comparison/IN/LIKE-
  * prefix/null-check predicates with AND/OR/NOT, projections with
  * +,-,* arithmetic and CASE WHEN, optional DISTINCT, grouped
  * sum/count/min/max/avg, and sum-over-partition windows. Timestamp
  * columns are excluded (DuckDB and Spark render them differently);
  * integer columns are widened to BIGINT at arithmetic/sum sites in
  * BOTH renderings so the engines agree on result types.
  */
object QueryFuzzer {

  final case class ColDef(table: String, name: String, kind: Char) {
    def isNum: Boolean = kind == 'L' || kind == 'I' || kind == 'D'
    def isIntegral: Boolean = kind == 'L' || kind == 'I'
  }

  /** The fuzzable column catalog (timestamp columns excluded). */
  val tables: Map[String, Seq[ColDef]] = Map(
    "customer" -> Seq(("c_custkey", 'L'), ("c_name", 'S'),
      ("c_nationkey", 'I'), ("c_acctbal", 'D'), ("c_mktsegment", 'S')),
    "orders" -> Seq(("o_orderkey", 'L'), ("o_custkey", 'L'),
      ("o_orderstatus", 'S'), ("o_totalprice", 'D'),
      ("o_orderpriority", 'S')),
    "lineitem" -> Seq(("l_orderkey", 'L'), ("l_partkey", 'L'),
      ("l_suppkey", 'L'), ("l_linenumber", 'I'), ("l_quantity", 'D'),
      ("l_extendedprice", 'D'), ("l_discount", 'D'), ("l_tax", 'D'),
      ("l_returnflag", 'S'), ("l_linestatus", 'S')),
    "nation" -> Seq(("n_nationkey", 'I'), ("n_name", 'S'),
      ("n_regionkey", 'I')),
    "region" -> Seq(("r_regionkey", 'I'), ("r_name", 'S')),
    "part" -> Seq(("p_partkey", 'L'), ("p_name", 'S'),
      ("p_brand", 'S'), ("p_type", 'S'), ("p_size", 'I'),
      ("p_retailprice", 'D')),
    "supplier" -> Seq(("s_suppkey", 'L'), ("s_name", 'S'),
      ("s_nationkey", 'I'), ("s_acctbal", 'D')),
  ).map { case (t, cs) => t -> cs.map { case (n, k) => ColDef(t, n, k) } }

  /** FK edges (leftTable.leftKey -> rightTable.rightKey). */
  val joinEdges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
  )

  // ---- AST ------------------------------------------------------------

  sealed trait Pred
  final case class Cmp(col: ColDef, op: String, lit: Any) extends Pred
  final case class InList(col: ColDef, lits: Seq[Any]) extends Pred
  final case class LikePrefix(col: ColDef, prefix: String) extends Pred
  final case class NullCheck(col: ColDef, isNull: Boolean) extends Pred
  final case class Bin(l: Pred, r: Pred, and: Boolean) extends Pred
  final case class NotP(p: Pred) extends Pred

  sealed trait OutCol { def alias: String }
  final case class PlainCol(col: ColDef, alias: String) extends OutCol
  final case class ArithCol(a: ColDef, op: String, b: ColDef,
                            alias: String) extends OutCol
  final case class CaseCol(pred: Pred, alias: String) extends OutCol
  /** Scalar function call: LENGTH/UPPER over strings, ABS over
    * numerics — functions both dialects define identically on the
    * harness's ASCII data.
    */
  final case class FuncCol(func: String, col: ColDef, alias: String)
    extends OutCol

  final case class AggCol(func: String, col: Option[ColDef],
                          alias: String)

  sealed trait Shape
  final case class Proj(cols: Seq[OutCol], distinct: Boolean)
    extends Shape
  /** `having` = (alias of a COUNT aggregate, minimum value): rendered
    * as a post-aggregation filter (subquery-wrapped in SQL — alias
    * references in HAVING are a dialect extension; the wrap is
    * portable and plans identically).
    */
  final case class Agg(groups: Seq[ColDef], aggs: Seq[AggCol],
                       having: Option[(String, Long)] = None)
    extends Shape
  final case class Win(keys: Seq[ColDef], part: ColDef, num: ColDef,
                       alias: String) extends Shape

  /** (table, key, table, key, isLeftJoin) in left-deep join order. */
  type JoinUse = (String, String, String, String, Boolean)

  /** [NOT] EXISTS correlated on an FK edge, with an optional extra
    * predicate over the inner table — rendered as a correlated
    * subquery in SQL and as a left_semi/left_anti join in the Column
    * API (the two formulations every engine must agree on).
    */
  final case class Semi(lt: String, lk: String, rt: String, rk: String,
                        negated: Boolean, pred: Option[Pred])

  final case class FuzzQuery(seed: Int, baseTable: String,
                             joins: Seq[JoinUse], preds: Seq[Pred],
                             shape: Shape,
                             semis: Seq[Semi] = Seq.empty) {

    // ---- SQL rendering (the DuckDB side) ----

    private def sqlLit(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case d: Double => new java.math.BigDecimal(d).toPlainString
      case other => other.toString
    }

    private def sqlPred(p: Pred): String = p match {
      case Cmp(c, op, l) => s"${c.name} $op ${sqlLit(l)}"
      case InList(c, ls) =>
        s"${c.name} IN (${ls.map(sqlLit).mkString(", ")})"
      case LikePrefix(c, pre) => s"${c.name} LIKE '$pre%'"
      case NullCheck(c, isN) =>
        s"${c.name} IS ${if (isN) "" else "NOT "}NULL"
      case Bin(l, r, and) =>
        s"(${sqlPred(l)} ${if (and) "AND" else "OR"} ${sqlPred(r)})"
      case NotP(inner) => s"(NOT ${sqlPred(inner)})"
    }

    private def sqlNum(c: ColDef): String =
      if (c.kind == 'I') s"CAST(${c.name} AS BIGINT)" else c.name

    private def sqlOut(o: OutCol): String = o match {
      case PlainCol(c, a) => s"${c.name} AS $a"
      case ArithCol(x, op, y, a) =>
        s"(${sqlNum(x)} $op ${sqlNum(y)}) AS $a"
      case CaseCol(p, a) =>
        s"(CASE WHEN ${sqlPred(p)} THEN 1 ELSE 0 END) AS $a"
      case FuncCol(f, c, a) =>
        s"${f.toUpperCase}(${c.name}) AS $a"
    }

    private def sqlAgg(a: AggCol): String = a.func match {
      case "count*" => s"COUNT(*) AS ${a.alias}"
      case "count" => s"COUNT(${a.col.get.name}) AS ${a.alias}"
      case "sum" =>
        val c = a.col.get
        if (c.kind == 'D') s"SUM(${c.name}) AS ${a.alias}"
        else s"CAST(SUM(${sqlNum(c)}) AS BIGINT) AS ${a.alias}"
      case "avg" => s"AVG(${a.col.get.name}) AS ${a.alias}"
      case f => s"${f.toUpperCase}(${a.col.get.name}) AS ${a.alias}"
    }

    private def sqlSemi(s: Semi): String = {
      val inner = s"${s.rt}.${s.rk} = ${s.lt}.${s.lk}" +
        s.pred.map(p => s" AND ${sqlPred(p)}").getOrElse("")
      s"${if (s.negated) "NOT " else ""}EXISTS " +
        s"(SELECT 1 FROM ${s.rt} WHERE $inner)"
    }

    def sql: String = {
      val from = joins.foldLeft(baseTable) {
        case (acc, (lt, lk, rt, rk, isLeft)) =>
          s"$acc ${if (isLeft) "LEFT " else ""}JOIN $rt ON $lt.$lk = $rt.$rk"
      }
      val conds = preds.map(sqlPred) ++ semis.map(sqlSemi)
      val where =
        if (conds.isEmpty) "" else " WHERE " + conds.mkString(" AND ")
      shape match {
        case Proj(cols, distinct) =>
          s"SELECT ${if (distinct) "DISTINCT " else ""}" +
            s"${cols.map(sqlOut).mkString(", ")} FROM $from$where"
        case Agg(groups, aggs, having) =>
          val gSel = groups.zipWithIndex
            .map { case (g, i) => s"${g.name} AS g$i" }
          val sel = (gSel ++ aggs.map(sqlAgg)).mkString(", ")
          val by =
            if (groups.isEmpty) ""
            else " GROUP BY " + groups.map(_.name).mkString(", ")
          val agg = s"SELECT $sel FROM $from$where$by"
          having match {
            case None => agg
            case Some((alias, k)) =>
              s"SELECT * FROM ($agg) h WHERE $alias >= $k"
          }
        case Win(keys, part, num, alias) =>
          val kSel = keys.zipWithIndex
            .map { case (k, i) => s"${k.name} AS k$i" }
          // integral window sums land as BIGINT in both dialects
          // (DuckDB's native SUM(BIGINT) OVER returns HUGEINT)
          val raw = s"SUM(${sqlNum(num)}) OVER " +
            s"(PARTITION BY ${part.name})"
          val w = (if (num.isIntegral) s"CAST($raw AS BIGINT)" else raw) +
            s" AS $alias"
          s"SELECT ${(kSel :+ w).mkString(", ")} FROM $from$where"
      }
    }

    // ---- Spark rendering (the Column-API side) ----

    private def sparkLit(v: Any): Column = v match {
      case d: Double => lit(d)
      case l: Long => lit(l)
      case i: Int => lit(i)
      case s: String => lit(s)
      case other => lit(other)
    }

    /** The filtered-joined relation BEFORE the output shape — the TLP
      * self-check's subject (FuzzSpec partitions it by a predicate).
      */
    private[graft] def baseDF(spark: SparkSession,
                              dir: String): DataFrame = {
      val base = graft.Tables(spark, dir, baseTable)
      joins.foldLeft(base) {
        case (acc, (_, lk, rt, rk, isLeft)) =>
          acc.join(graft.Tables(spark, dir, rt),
            col(lk) === col(rk), if (isLeft) "left" else "inner")
      }
    }

    private[graft] def predColumn(p: Pred): Column = sparkPred(p)

    private def sparkPred(p: Pred): Column = p match {
      case Cmp(c, op, l) => op match {
        case "<" => col(c.name) < sparkLit(l)
        case "<=" => col(c.name) <= sparkLit(l)
        case ">" => col(c.name) > sparkLit(l)
        case ">=" => col(c.name) >= sparkLit(l)
        case "=" => col(c.name) === sparkLit(l)
        case "<>" => col(c.name) =!= sparkLit(l)
      }
      case InList(c, ls) => col(c.name).isin(ls: _*)
      case LikePrefix(c, pre) => col(c.name).like(s"$pre%")
      case NullCheck(c, isN) =>
        if (isN) col(c.name).isNull else col(c.name).isNotNull
      case Bin(l, r, and) =>
        if (and) sparkPred(l) && sparkPred(r)
        else sparkPred(l) || sparkPred(r)
      case NotP(inner) => !sparkPred(inner)
    }

    private def sparkNum(c: ColDef): Column =
      if (c.kind == 'I') col(c.name).cast("long") else col(c.name)

    private def sparkOut(o: OutCol): Column = o match {
      case PlainCol(c, a) => col(c.name).as(a)
      case ArithCol(x, op, y, a) =>
        (op match {
          case "+" => sparkNum(x) + sparkNum(y)
          case "-" => sparkNum(x) - sparkNum(y)
          case "*" => sparkNum(x) * sparkNum(y)
        }).as(a)
      case CaseCol(p, a) =>
        when(sparkPred(p), lit(1L)).otherwise(lit(0L)).as(a)
      case FuncCol(f, c, a) => (f match {
        case "length" => length(col(c.name)).cast("long")
        case "upper" => upper(col(c.name))
        case "abs" => abs(col(c.name))
      }).as(a)
    }

    private def sparkAgg(a: AggCol): Column = a.func match {
      case "count*" => count(lit(1)).as(a.alias)
      case "count" => count(col(a.col.get.name)).as(a.alias)
      case "sum" =>
        val c = a.col.get
        (if (c.kind == 'D') sum(col(c.name)) else sum(sparkNum(c)))
          .as(a.alias)
      case "avg" => avg(col(a.col.get.name)).as(a.alias)
      case "min" => min(col(a.col.get.name)).as(a.alias)
      case "max" => max(col(a.col.get.name)).as(a.alias)
    }

    def toDF(spark: SparkSession, dir: String): DataFrame = {
      val joined = baseDF(spark, dir)
      val predded = preds.foldLeft(joined)((d, p) => d.filter(sparkPred(p)))
      // [NOT] EXISTS = left_semi/left_anti against the (optionally
      // pre-filtered) inner table's key column
      val filtered = semis.foldLeft(predded) { (d, s) =>
        val inner0 = graft.Tables(spark, dir, s.rt)
        val inner = s.pred.fold(inner0)(p => inner0.filter(sparkPred(p)))
          .select(s.rk)
        d.join(inner, col(s.lk) === col(s.rk),
          if (s.negated) "left_anti" else "left_semi")
      }
      shape match {
        case Proj(cols0, distinct) =>
          val p = filtered.select(cols0.map(sparkOut): _*)
          if (distinct) p.distinct() else p
        case Agg(groups, aggs, having) =>
          val gCols = groups.zipWithIndex
            .map { case (g, i) => col(g.name).as(s"g$i") }
          val aCols = aggs.map(sparkAgg)
          val agged =
            if (groups.isEmpty) filtered.agg(aCols.head, aCols.tail: _*)
            else filtered.groupBy(gCols: _*)
              .agg(aCols.head, aCols.tail: _*)
          having match {
            case None => agged
            case Some((alias, k)) => agged.filter(col(alias) >= lit(k))
          }
        case Win(keys, part, num, alias) =>
          val kCols = keys.zipWithIndex
            .map { case (k, i) => col(k.name).as(s"k$i") }
          filtered.select(kCols :+
            sum(sparkNum(num)).over(Window.partitionBy(col(part.name)))
              .as(alias): _*)
      }
    }

    /** Shrink candidates: the same query minus one predicate / one
      * output column / one aggregate / the DISTINCT — each still a
      * valid query. Used to minimize a failing seed.
      */
    def shrinks: Seq[FuzzQuery] = {
      val fewerPreds = preds.indices.map(i =>
        copy(preds = preds.patch(i, Nil, 1)))
      val fewerSemis = semis.indices.flatMap { i =>
        val dropped = copy(semis = semis.patch(i, Nil, 1))
        val unPredded =
          if (semis(i).pred.isDefined)
            Seq(copy(semis =
              semis.updated(i, semis(i).copy(pred = None))))
          else Seq.empty
        dropped +: unPredded
      }
      val shapeShrinks = shape match {
        case Proj(cols0, d) =>
          val fewer =
            if (cols0.size > 1)
              cols0.indices.map(i =>
                copy(shape = Proj(cols0.patch(i, Nil, 1), d)))
            else Seq.empty
          fewer ++ (if (d) Seq(copy(shape = Proj(cols0, distinct = false)))
                    else Seq.empty)
        case Agg(gs, as0, hv) =>
          val dropHaving =
            if (hv.isDefined) Seq(copy(shape = Agg(gs, as0, None)))
            else Seq.empty
          val fewerAggs =
            if (as0.size > 1)
              as0.indices.flatMap { i =>
                val rest = as0.patch(i, Nil, 1)
                // never orphan a HAVING that references the dropped agg
                if (hv.exists(h => !rest.exists(_.alias == h._1)))
                  None
                else Some(copy(shape = Agg(gs, rest, hv)))
              }
            else Seq.empty
          dropHaving ++ fewerAggs
        case _ => Seq.empty
      }
      fewerPreds ++ fewerSemis ++ shapeShrinks
    }
  }

  // ---- literal pools ---------------------------------------------------

  /** Up to `k` distinct non-null values per column, in a STABLE order
    * (ascending), sampled once per (session, dir) — the literal pool
    * the generator draws comparison/IN/LIKE constants from, embedded
    * identically in both renderings.
    */
  def samplePools(spark: SparkSession, dir: String, k: Int = 24)
      : Map[(String, String), IndexedSeq[Any]] =
    tables.flatMap { case (t, cols) =>
      val df = graft.Tables(spark, dir, t)
      cols.map { c =>
        val vals = df.select(c.name).na.drop().distinct()
          .orderBy(col(c.name)).limit(k).collect()
          .map(_.get(0)).toIndexedSeq
        (t, c.name) -> vals
      }
    }

  // ---- generator -------------------------------------------------------

  def gen(seed: Int,
          pools: Map[(String, String), IndexedSeq[Any]]): FuzzQuery = {
    val rnd = new scala.util.Random(seed)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    // base table + 0..2 chained FK joins
    val nJoins = rnd.nextInt(10) match {
      case n if n < 5 => 0
      case n if n < 8 => 1
      case _ => 2
    }
    var present = Vector.empty[String]
    var joins = Vector.empty[JoinUse]
    if (nJoins == 0) {
      present = Vector(pick(tables.keys.toSeq.sorted))
    } else {
      val e1 = pick(joinEdges)
      present = Vector(e1._1, e1._3)
      joins = Vector((e1._1, e1._2, e1._3, e1._4, rnd.nextInt(10) < 3))
      if (nJoins == 2) {
        val cands = joinEdges.filter(e =>
          present.contains(e._1) && !present.contains(e._3))
        if (cands.nonEmpty) {
          val e2 = pick(cands)
          present = present :+ e2._3
          joins = joins :+
            ((e2._1, e2._2, e2._3, e2._4, rnd.nextInt(10) < 3))
        }
      }
    }
    val cols = present.flatMap(tables(_))
    val strCols = cols.filter(_.kind == 'S')
    val numCols = cols.filter(_.isNum)
    val keyCols = cols.filter(c => c.kind != 'D')

    def litOf(c: ColDef): Any = {
      val pool = pools((c.table, c.name))
      pool(rnd.nextInt(pool.size))
    }

    def genLeafPredOver(over: Seq[ColDef]): Pred = {
      val overStr = over.filter(_.kind == 'S')
      rnd.nextInt(10) match {
        case n if n < 5 =>
          val c = pick(over)
          Cmp(c, pick(Seq("<", "<=", ">", ">=", "=", "<>")), litOf(c))
        case n if n < 7 =>
          val c = pick(over)
          val pool = pools((c.table, c.name))
          val k = 1 + rnd.nextInt(math.min(4, pool.size))
          InList(c, Seq.fill(k)(pool(rnd.nextInt(pool.size))).distinct)
        case n if n < 9 && overStr.nonEmpty =>
          val c = pick(overStr)
          val v = litOf(c).toString
          val pre = v.take(1 + rnd.nextInt(math.min(4, math.max(1, v.length))))
            .filterNot(ch => ch == '%' || ch == '_' || ch == '\'')
          if (pre.nonEmpty) LikePrefix(c, pre)
          else Cmp(c, "=", litOf(c))
        case _ =>
          // null checks only bite after LEFT joins; harmless elsewhere
          NullCheck(pick(over), isNull = rnd.nextBoolean())
      }
    }
    def genLeafPred(): Pred = genLeafPredOver(cols)

    def genPred(depth: Int): Pred =
      if (depth > 0 && rnd.nextInt(10) < 4) {
        val p = Bin(genPred(depth - 1), genPred(depth - 1),
          and = rnd.nextBoolean())
        if (rnd.nextInt(10) < 2) NotP(p) else p
      } else genLeafPred()

    val preds = Seq.fill(rnd.nextInt(3))(genPred(1))

    // [NOT] EXISTS on an FK edge whose inner table is NOT already
    // joined (a Column-API semi join would otherwise hit ambiguous
    // key attributes)
    val semis =
      if (rnd.nextInt(10) < 3) {
        val cands = joinEdges.filter(e =>
          present.contains(e._1) && !present.contains(e._3))
        if (cands.isEmpty) Seq.empty
        else {
          val e = pick(cands)
          val innerPred =
            if (rnd.nextBoolean())
              Some(genLeafPredOver(tables(e._3)))
            else None
          Seq(Semi(e._1, e._2, e._3, e._4,
            negated = rnd.nextInt(10) < 4, pred = innerPred))
        }
      } else Seq.empty

    def genOutCol(i: Int): OutCol = rnd.nextInt(12) match {
      case n if n < 6 => PlainCol(pick(cols), s"c$i")
      case n if n < 8 && numCols.nonEmpty =>
        ArithCol(pick(numCols), pick(Seq("+", "-", "*")),
          pick(numCols), s"c$i")
      case n if n < 10 =>
        if (rnd.nextBoolean() && strCols.nonEmpty)
          FuncCol(pick(Seq("length", "upper")), pick(strCols), s"c$i")
        else FuncCol("abs", pick(numCols), s"c$i")
      case _ => CaseCol(genLeafPred(), s"c$i")
    }

    val shape: Shape = rnd.nextInt(10) match {
      case n if n < 4 =>
        Proj((0 until (2 + rnd.nextInt(3))).map(genOutCol),
          distinct = rnd.nextInt(10) < 3)
      case n if n < 9 =>
        val groups =
          if (rnd.nextInt(10) < 2) Seq.empty
          else Seq.fill(1 + rnd.nextInt(2))(pick(keyCols)).distinct
        val nAggs = 1 + rnd.nextInt(3)
        val aggs = (0 until nAggs).map { i =>
          rnd.nextInt(6) match {
            case 0 => AggCol("count*", None, s"a$i")
            case 1 => AggCol("count", Some(pick(cols)), s"a$i")
            case 2 => AggCol("sum", Some(pick(numCols)), s"a$i")
            case 3 => AggCol("avg", Some(pick(numCols)), s"a$i")
            case 4 => AggCol("min", Some(pick(cols)), s"a$i")
            case _ => AggCol("max", Some(pick(cols)), s"a$i")
          }
        }
        // HAVING on a COUNT aggregate (always integral, never null)
        val having = aggs.find(_.func.startsWith("count"))
          .filter(_ => groups.nonEmpty && rnd.nextInt(10) < 4)
          .map(a => (a.alias, 1L + rnd.nextInt(4)))
        Agg(groups, aggs, having)
      case _ =>
        Win(Seq.fill(2)(pick(cols)).distinct, pick(keyCols),
          pick(numCols), "w")
    }

    FuzzQuery(seed, present.head, joins, preds, shape, semis)
  }
}
