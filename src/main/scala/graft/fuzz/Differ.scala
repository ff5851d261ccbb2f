package graft.fuzz

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Engine-vs-oracle comparison for the differential fuzzer: runs a
  * batch of generated SQL in DuckDB (out-of-process via
  * `tools/fuzz_duckdb.py` — the same driver-side python the oracle
  * gate uses), canonicalizes both engines' rows, and reports the
  * first divergence. Shared by FuzzSpec (the in-suite 220-seed gate)
  * and [[Fuzz]] (ad-hoc large campaigns).
  *
  * Comparison contract: columns aligned by alias, rows compared as
  * sorted multisets, integrals exact, floating point within 1e-6
  * RELATIVE tolerance (cross-engine double aggregation is
  * order-dependent in the last ulps; anything past the tolerance is a
  * real divergence). Row alignment is two-tier: a fast positional
  * compare on 6-dp-rounded sort keys, and — because two in-tolerance
  * values can straddle a rounding boundary and sort apart — any
  * positional mismatch is confirmed by a tolerant multiset match
  * before it is reported as a divergence.
  */
object Differ {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def duckAvailable(): Boolean =
    try {
      import scala.sys.process._
      Seq("python3", "-c", "import duckdb").! == 0
    } catch { case _: Throwable => false }

  /** Run named SQL statements in DuckDB over `sfDir`'s parquet;
    * Right((cols, rows)) per query, Left(error) for a statement that
    * failed (one bad statement never takes down the batch).
    */
  def runDuck(sfDir: String, sqls: Map[String, String],
              repoRoot: String = ".")
      : Map[String, Either[String, (Seq[String], Seq[Seq[Any]])]] = {
    import scala.sys.process._
    val jm = new java.util.LinkedHashMap[String, String]()
    sqls.foreach { case (k, v) => jm.put(k, v) }
    val qf = java.nio.file.Files.createTempFile("fuzzq", ".json")
    java.nio.file.Files.write(qf,
      mapper.writeValueAsString(jm).getBytes("UTF-8"))
    val out = Seq("python3", s"$repoRoot/tools/fuzz_duckdb.py", sfDir,
      qf.toString).!!
    java.nio.file.Files.deleteIfExists(qf)
    val parsed = mapper.readValue(out,
      classOf[java.util.Map[String, Object]]).asScala
    parsed.map { case (name, vObj) =>
      val m = vObj.asInstanceOf[java.util.Map[String, Object]]
      val res =
        if (m.containsKey("error")) Left(m.get("error").toString)
        else {
          val cols = m.get("cols").asInstanceOf[java.util.List[Object]]
            .asScala.map(_.toString).toSeq
          val rows = m.get("rows").asInstanceOf[java.util.List[Object]]
            .asScala.map(_.asInstanceOf[java.util.List[Object]]
              .asScala.map(x => x: Any).toSeq).toSeq
          Right((cols, rows))
        }
      name -> res
    }.toMap
  }

  // ---- canonical value model ----

  sealed trait V
  case object VN extends V
  final case class VL(v: Long) extends V
  final case class VD(v: Double) extends V
  final case class VS(s: String) extends V
  final case class VB(b: Boolean) extends V

  def norm(a: Any): V = a match {
    case null => VN
    case i: java.lang.Integer => VL(i.longValue())
    case l: java.lang.Long => VL(l.longValue())
    // DuckDB integral SUMs come back as HUGEINT (int128): inside
    // int64 compare exactly; outside it degrade to double rather
    // than throw — one overflowing query must report as ITS OWN
    // divergence, never abort the whole diff batch
    case bi: java.math.BigInteger =>
      if (bi.bitLength() < 64) VL(bi.longValue())
      else VD(bi.doubleValue())
    case bd: java.math.BigDecimal => VD(bd.doubleValue())
    case f: java.lang.Float => VD(f.doubleValue())
    case d: java.lang.Double => VD(d.doubleValue())
    case s: String => VS(s)
    case b: java.lang.Boolean => VB(b.booleanValue())
    case other => VS(other.toString)
  }

  def sortKey(v: V): String = v match {
    case VN => " "
    case VL(l) => "N%+021d".format(l)
    case VD(d) =>
      if (d.isNaN || d.isInfinite) s"X$d"
      else "N" + BigDecimal(d).setScale(6, BigDecimal.RoundingMode
        .HALF_UP).underlying.toPlainString.reverse.padTo(28, ' ')
        .reverse
    case VS(s) => "S" + s
    case VB(b) => "B" + b
  }

  def eqV(a: V, b: V): Boolean = (a, b) match {
    case (VN, VN) => true
    case (VL(x), VL(y)) => x == y
    case (VL(x), VD(y)) => eqNum(x.toDouble, y)
    case (VD(x), VL(y)) => eqNum(x, y.toDouble)
    case (VD(x), VD(y)) => eqNum(x, y)
    case (VS(x), VS(y)) => x == y
    case (VB(x), VB(y)) => x == y
    case _ => false
  }

  private def eqNum(x: Double, y: Double): Boolean =
    x == y || // exact fast path; the only rule under which two
              // infinities are equal
      (x.isNaN && y.isNaN) ||
      // tolerance arm is FINITE-only: with an infinite operand the
      // bound itself is 1e-6·Inf = Inf, which silently accepted
      // Inf-vs-anything (and +Inf vs -Inf) as equal
      (!x.isInfinite && !y.isInfinite &&
        math.abs(x - y) <= 1e-6 * math.max(1.0,
          math.max(math.abs(x), math.abs(y))))

  /** None = match; Some(reason) = divergence. */
  def diff(spark: SparkSession, dir: String,
           q: QueryFuzzer.FuzzQuery,
           duck: Either[String, (Seq[String], Seq[Seq[Any]])])
      : Option[String] = {
    val df = q.toDF(spark, dir)
    val sparkCols = df.columns.toSeq
    val sparkRows = df.collect().toSeq
      .map(r => sparkCols.indices.map(i => norm(r.get(i))))
    duck match {
      case Left(err) => Some(s"duckdb error: $err")
      case Right((dCols, dRows0)) =>
        if (dCols.sorted != sparkCols.sorted)
          return Some(s"schema: spark=$sparkCols duck=$dCols")
        val idx = sparkCols.map(dCols.indexOf)
        val dRows = dRows0.map(r => idx.map(i => norm(r(i))))
        if (dRows.size != sparkRows.size)
          return Some(s"rows: spark=${sparkRows.size} duck=${dRows.size}")
        alignAndCompare(sparkRows, dRows)
    }
  }

  /** Row-multiset compare: sort both sides on 6-dp-rounded keys and
    * compare positionally (fast path). Two values inside the 1e-6
    * tolerance can straddle a 6-dp rounding boundary and land in
    * different sort positions, so a positional mismatch is only a
    * CANDIDATE divergence — confirm it with a tolerant multiset match
    * before reporting. None = match.
    */
  private[graft] def alignAndCompare(sparkRows: Seq[Seq[V]],
                                     dRows: Seq[Seq[V]])
      : Option[String] = {
    val s = sparkRows.sortBy(_.map(sortKey).mkString(""))
    val d = dRows.sortBy(_.map(sortKey).mkString(""))
    val positional = s.zip(d).zipWithIndex.collectFirst {
      case ((sr, dr), ri) if !rowEq(sr, dr) =>
        s"row $ri: spark=$sr duck=$dr"
    }
    positional.flatMap(reason =>
      tolerantMatch(s, d).map(t => s"$t (positional: $reason)"))
  }

  private def rowEq(a: Seq[V], b: Seq[V]): Boolean =
    a.size == b.size && a.zip(b).forall((eqV _).tupled)

  // bucket key: exact on strings/bools/nulls, wildcard on numerics
  // (a value can be VL in one engine and VD in the other, and floats
  // match under tolerance — no rounding of the key can be finer than
  // the comparison without re-creating the boundary problem)
  private def bucketKey(r: Seq[V]): String = r.map {
    case VL(_) | VD(_) => "#"
    case v => sortKey(v)
  }.mkString("")

  /** Tolerant multiset match (slow path, runs only on a positional
    * mismatch): bucket rows by their non-numeric values, then find a
    * MAXIMUM bipartite matching within each bucket under [[eqV]].
    * Greedy pairing is not sound here: the 1e-6 tolerance relation is
    * non-transitive, so values chain (spark a ≈ duck x AND a ≈ y
    * while spark b only ≈ x) and a greedy pass can consume the wrong
    * partner and report a false divergence even though a perfect
    * matching exists; augmenting paths re-pair the earlier row
    * instead.
    *
    * The matcher is Hopcroft–Karp (BFS layering + layered DFS,
    * O(E·√V)) over a WINDOWED adjacency: candidate partners for a
    * row are found by binary search on the bucket's first numeric
    * column (two rows can only match if that column is within the
    * relative tolerance, a contiguous range in sorted order), so E is
    * tolerance-cluster-sized, not bucket². This removes the round-13
    * MatchExactCap=2048 greedy fallback, whose false-divergence mode
    * an ALL-NUMERIC row set (one giant bucket — common for
    * multi-aggregate queries) could re-trigger at size. The one
    * remaining guard is [[EdgeBudget]] on total adjacency size; a
    * bucket so mutually-tolerant it exceeds it falls back to
    * sorted-positional pairing — still sound in the safe direction
    * (may over-report, never misses a true divergence), and says so
    * in the report. None = the multisets match under tolerance;
    * Some(reason) = a spark row no maximum matching can pair with.
    */
  private val EdgeBudget = 50000000L

  private def numOf(v: V): Option[Double] = v match {
    case VL(l) => Some(l.toDouble)
    case VD(d) => Some(d)
    case _ => None
  }

  private def tolerantMatch(s: Seq[Seq[V]],
                            d: Seq[Seq[V]]): Option[String] = {
    val sb = s.groupBy(bucketKey)
    val db = d.groupBy(bucketKey)
    sb.iterator.flatMap { case (key, srs0) =>
      val srs = srs0.toIndexedSeq
      val drs = db.getOrElse(key, Seq.empty).toIndexedSeq
      matchBucket(srs, drs)
    }.take(1).toSeq.headOption
  }

  /** Maximum matching within one bucket; iterator of divergence
    * reports (empty = all spark rows matched).
    */
  private def matchBucket(srs: IndexedSeq[Seq[V]],
                          drs: IndexedSeq[Seq[V]]): Iterator[String] = {
    if (srs.isEmpty) return Iterator.empty
    if (drs.size < srs.size)
      return Iterator(s"unmatched spark row: ${srs(drs.size)} " +
        s"(bucket sizes spark=${srs.size} duck=${drs.size})")
    // pivot = first numeric column of the bucket (bucketKey wildcards
    // exactly the numeric positions, so they are bucket-consistent);
    // a bucket with NO numeric column holds pairwise-identical rows
    // (the key is exact on everything else) — counts decide.
    val pivot = srs.head.indices.find(i => numOf(srs.head(i)).isDefined)
    pivot match {
      case None => Iterator.empty // sizes checked above; rows identical
      case Some(p) =>
        // duck rows sorted by pivot value; NaN sorts last (by
        // java.lang.Double.compare), infinities at the ends — the
        // window for non-finite pivots is found by exact-value scan
        val order = drs.indices.sortBy(j =>
          numOf(drs(j)(p)).get)(Ordering.Double.TotalOrdering)
        val sorted = order.map(j => numOf(drs(j)(p)).get)
        def window(x: Double): (Int, Int) =
          if (x.isNaN || x.isInfinite) {
            // exact-value run: binary search then widen
            val lo = lowerBound(sorted, x)
            var hi = lo
            while (hi < sorted.size && (sorted(hi) == x ||
              (sorted(hi).isNaN && x.isNaN))) hi += 1
            (lo, hi)
          } else {
            // |x - y| <= 1e-6 * max(1, |x|, |y|): y is confined to
            // x ± w with w = 1e-6 * max(1, |x|) / (1 - 1e-6); widen
            // by 2x for rounding headroom (over-wide is only extra
            // rowEq calls, never wrong)
            val w = 2e-6 * math.max(1.0, math.abs(x)) / (1 - 1e-6)
            (lowerBound(sorted, x - w), upperBound(sorted, x + w))
          }
        // edge budget pre-check: Σ window sizes
        var edges = 0L
        val wins = srs.map { sr =>
          val x = numOf(sr(p)).get
          val (lo, hi) = window(x)
          edges += (hi - lo)
          (lo, hi)
        }
        if (edges > EdgeBudget) {
          // pathological mutual-tolerance: pair positionally after a
          // full-row sort (over-reports at worst, never misses)
          val ss = srs.sortBy(_.map(sortKey).mkString(""))
          val ds = drs.sortBy(_.map(sortKey).mkString(""))
          return ss.indices.iterator.flatMap { i =>
            if (i < ds.size && rowEq(ss(i), ds(i))) None
            else Some(s"unmatched spark row: ${ss(i)} (edge budget " +
              s"$EdgeBudget exceeded; sorted-positional fallback — " +
              "may over-report)")
          }
        }
        val adj = srs.indices.map { i =>
          val (lo, hi) = wins(i)
          (lo until hi).filter(oj => rowEq(srs(i), drs(order(oj))))
            .toArray
        }
        val mL = hopcroftKarp(srs.size, drs.size, adj)
        srs.indices.iterator.collect {
          case i if mL(i) < 0 => s"unmatched spark row: ${srs(i)}"
        }
    }
  }

  private def lowerBound(a: IndexedSeq[Double], x: Double): Int = {
    var lo = 0; var hi = a.size
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (java.lang.Double.compare(a(m), x) < 0) lo = m + 1 else hi = m
    }
    lo
  }

  private def upperBound(a: IndexedSeq[Double], x: Double): Int = {
    var lo = 0; var hi = a.size
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (java.lang.Double.compare(a(m), x) <= 0) lo = m + 1 else hi = m
    }
    lo
  }

  /** Hopcroft–Karp maximum bipartite matching. `adj(i)` lists the
    * right-side candidates of left row i (indices into the SORTED
    * right order — the caller translates back). Returns the left
    * matching (-1 = unmatched). DFS recursion depth is bounded by the
    * BFS layer count (≤ √V phases), never by bucket size.
    */
  private def hopcroftKarp(nL: Int, nR: Int,
                           adj: IndexedSeq[Array[Int]]): Array[Int] = {
    val INF = Int.MaxValue
    val mL = Array.fill(nL)(-1)
    val mR = Array.fill(nR)(-1)
    val dist = new Array[Int](nL)
    def bfs(): Boolean = {
      val q = new java.util.ArrayDeque[Integer]()
      var free = false
      var i = 0
      while (i < nL) {
        if (mL(i) < 0) { dist(i) = 0; q.add(i) } else dist(i) = INF
        i += 1
      }
      while (!q.isEmpty) {
        val u = q.poll()
        val as = adj(u)
        var a = 0
        while (a < as.length) {
          val w = mR(as(a))
          if (w < 0) free = true
          else if (dist(w) == INF) { dist(w) = dist(u) + 1; q.add(w) }
          a += 1
        }
      }
      free
    }
    def dfs(u: Int): Boolean = {
      val as = adj(u)
      var a = 0
      while (a < as.length) {
        val v = as(a)
        val w = mR(v)
        if (w < 0 || (dist(w) == dist(u) + 1 && dfs(w))) {
          mL(u) = v; mR(v) = u
          return true
        }
        a += 1
      }
      dist(u) = INF
      false
    }
    while (bfs()) {
      var i = 0
      while (i < nL) { if (mL(i) < 0) dfs(i); i += 1 }
    }
    mL
  }

  /** Greedy minimization: keep applying the first shrink that still
    * diverges until none does.
    */
  def minimize(spark: SparkSession, dir: String,
               q0: QueryFuzzer.FuzzQuery, d0: String,
               repoRoot: String = ".")
      : (QueryFuzzer.FuzzQuery, String) = {
    var cur = q0
    var curDiff = d0
    var continue = true
    while (continue) {
      val next = cur.shrinks.iterator.flatMap { s =>
        val dk = runDuck(dir, Map("s" -> s.sql), repoRoot)("s")
        diff(spark, dir, s, dk).map(reason => (s, reason))
      }.take(1).toSeq.headOption
      next match {
        case Some((s, reason)) => cur = s; curDiff = reason
        case None => continue = false
      }
    }
    (cur, curDiff)
  }
}
