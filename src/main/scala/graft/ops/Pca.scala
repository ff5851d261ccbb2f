package graft.ops

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MatVecDots

/** PCA / whitening over an embedding corpus — the
  * dimensionality-reduction step of embedding-based curation (cheaper
  * downstream ANN, decorrelated features for outlier gates).
  *
  * Scale shape: mean and covariance come from ONE `treeAggregate` whose
  * accumulator is (n, sum[dim], outer-product sum[dim x dim]) —
  * dimension-sized regardless of row count, exactly the Gramian
  * pattern of distributed linear algebra. The eigendecomposition runs
  * on the driver over the dim x dim matrix (64x64 here — this is a
  * CODEBOOK-sized problem; corpus size never touches it), and the
  * projection back over the corpus is a single narrow map through one
  * [[MatVecDots]] matrix literal. No shuffle anywhere.
  */
object Pca {

  /** Fitted transform: sample mean, top-r components (rows, unit norm,
    * canonical sign), their eigenvalues (descending), and the total
    * variance (sum of ALL eigenvalues — for explained-variance ratios).
    */
  case class Fit(mean: Array[Double], components: IndexedSeq[Array[Double]],
                 eigenvalues: Array[Double], totalVariance: Double)

  /** The one-pass moment accumulation BOTH [[fit]] and
    * [[covarianceDf]] consume: (n, component sums, row-major
    * outer-product sums). One `treeAggregate`, dimension-sized
    * accumulator, no shuffle — the Gramian pattern.
    */
  private[graft] def momentsPass(corpus: DataFrame, vecCol: String,
                                 dim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val vecs = corpus.select(col(vecCol).cast("array<double>"))
      .rdd.map(_.getSeq[Double](0).toArray)
    vecs.treeAggregate(
      (0L, new Array[Double](dim), new Array[Double](dim * dim)))(
      seqOp = { case ((cnt, sum, outer), x) =>
        var i = 0
        while (i < dim) {
          sum(i) += x(i)
          var j = 0
          while (j < dim) { outer(i * dim + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        (cnt + 1, sum, outer)
      },
      combOp = { case ((n1, s1, o1), (n2, s2, o2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < o1.length) { o1(i) += o2(i); i += 1 }
        (n1 + n2, s1, o1)
      },
      depth = 2)
  }

  /** Sample covariance per (i, j) as rows — the SQL-expressible half
    * of PCA, split out for the oracle gate (s26): the eigendecomposition
    * [[fit]] runs on top is the only piece DuckDB cannot replay. Upper
    * triangle only (the matrix is symmetric by construction), 1-based
    * indices, cov = (o_ij - n·mean_i·mean_j)/(n - 1) — EXACTLY the
    * entries [[fit]] hands to eigSym, from the SAME [[momentsPass]]
    * (single source of truth; PcaSpec gates that eig over these rows
    * reproduces fit's spectrum). The returned frame is dim²-sized
    * driver-built literals — codebook-sized, corpus size never touches
    * it.
    */
  def covarianceDf(corpus: DataFrame, vecCol: String,
                   dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (n, s, o) = momentsPass(corpus, vecCol, dim)
    require(n >= 2, s"need at least 2 vectors, got $n")
    val mean = s.map(_ / n)
    (for { i <- 0 until dim; j <- i until dim }
      yield (i + 1, j + 1,
        (o(i * dim + j) - n * mean(i) * mean(j)) / (n - 1.0)))
      .toDF("i", "j", "cov")
  }

  /** One classical Jacobi rotation over an upper-triangle covariance
    * table (1-based (i, j) keys, i <= j) — the ATOMIC STEP of the
    * symmetric eigensolver, pinned for the oracle gate (s31). Pivot
    * selection: the largest |off-diagonal| cell, ties by (i, j)
    * ascending — ORDER BY abs(a) DESC, i, j LIMIT 1 in the replay.
    * Returns the rotated upper triangle (the pivot cell zeroed by
    * construction, the rotation angle's defining property) and the
    * pivot.
    *
    * Byte-exactness contract: every arithmetic step is a FIXED tree of
    * + - * / sqrt — all correctly rounded under IEEE 754 (sqrt
    * included, by requirement of the standard) — over byte-identical
    * inputs (the 6dp-rounded s26 relay), so an independent engine
    * replays every output double bit-for-bit with NO rounding anywhere
    * (the s24/s25/s27 contract, extended from dot products to the
    * eigensolver). t = sign(theta)/(|theta| + sqrt(theta^2 + 1)) is
    * the numerically stable smaller-root form (Golub & Van Loan
    * §8.5); theta overflowing to Inf degrades gracefully to t = 0
    * (identity rotation) identically in both engines.
    *
    * [[fit]] delegates the full solve to LAPACK (eigSym) — PcaSpec
    * gates that ITERATING this step to convergence reproduces fit's
    * spectrum, so the pinned step is the production algorithm's step,
    * not a lookalike. Driver-sized work: the matrix is dim x dim
    * (codebook-sized); corpus size never touches it.
    */
  def jacobiStep(a: Map[(Int, Int), Double], dim: Int)
      : (Seq[(Int, Int, Double)], (Int, Int)) = {
    def at(i: Int, j: Int): Double = if (i <= j) a((i, j)) else a((j, i))
    val (p, q) = (for { i <- 1 to dim; j <- (i + 1) to dim } yield (i, j))
      .maxBy { case (i, j) => (math.abs(at(i, j)), -i, -j) }
    val apq = at(p, q); val app = at(p, p); val aqq = at(q, q)
    require(apq != 0.0, "diagonal matrix: no rotation to pin")
    val theta = (aqq - app) / (2.0 * apq)
    val t = (if (theta >= 0.0) 1.0 else -1.0) /
      (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    val out = for { i <- 1 to dim; j <- i to dim } yield {
      val v =
        if (i == p && j == q) 0.0
        else if (i == p && j == p)
          c * c * app - 2.0 * s * c * apq + s * s * aqq
        else if (i == q && j == q)
          s * s * app + 2.0 * s * c * apq + c * c * aqq
        else if (i == p || j == p) {
          val r = if (i == p) j else i
          c * at(r, p) - s * at(r, q)
        } else if (i == q || j == q) {
          val r = if (i == q) j else i
          s * at(r, p) + c * at(r, q)
        } else at(i, j)
      (i, j, v)
    }
    (out, (p, q))
  }

  /** [[jacobiStep]] folded `iters` times — the eigensolver's ITERATION
    * COMPOSITION, pinned for the oracle gate (s32, two steps). Each
    * step's output is a fixed correctly-rounded tree over the previous
    * step's bytes, so the composition stays byte-replayable with NO
    * rounding relay between steps (unlike the Lloyd chain s27, whose
    * recentering DIVISIONS of order-dependent sums forced a 4dp relay
    * — the rotation has no order-dependent reduction at all). Returns
    * the final upper triangle and the pivot sequence.
    */
  def jacobiSteps(a: Map[(Int, Int), Double], dim: Int, iters: Int)
      : (Map[(Int, Int), Double], Seq[(Int, Int)]) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    var m = a
    val pivots = Seq.newBuilder[(Int, Int)]
    var k = 0
    while (k < iters) {
      val (rows, pq) = jacobiStep(m, dim)
      m = rows.map { case (i, j, v) => ((i, j), v) }.toMap
      pivots += pq
      k += 1
    }
    (m, pivots.result())
  }

  /** Fit PCA from one pass. Covariance is the SAMPLE covariance
    * (n - 1); eigenvector sign is canonicalized (largest-|coordinate|
    * entry positive) so results don't flip sign across partitionings
    * or BLAS builds.
    */
  def fit(corpus: DataFrame, vecCol: String, dim: Int, r: Int): Fit = {
    require(r >= 1 && r <= dim, s"need 1 <= r <= dim, got r=$r dim=$dim")
    val (n, s, o) = momentsPass(corpus, vecCol, dim)
    require(n >= 2, s"need at least 2 vectors, got $n")
    val mean = s.map(_ / n)
    val cov = DenseMatrix.tabulate(dim, dim) { (i, j) =>
      (o(i * dim + j) - n * mean(i) * mean(j)) / (n - 1.0)
    }
    val es = eigSym(cov) // ascending eigenvalues
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i))
    val comps = order.take(r).map { ei =>
      val v = Array.tabulate(dim)(d => es.eigenvectors(d, ei))
      // canonical sign: the largest-|coordinate| entry is positive
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(-_) else v
    }
    Fit(mean, comps, order.take(r).map(es.eigenvalues(_)).toArray,
      (0 until dim).map(es.eigenvalues(_)).sum)
  }

  /** Project every vector onto the fitted components: y = C (x - mean),
    * optionally whitened (y_i / sqrt(lambda_i)). One matrix literal,
    * one narrow projection over the scan.
    */
  def project(corpus: DataFrame, idCol: String, vecCol: String, fit: Fit,
              whiten: Boolean = false, as: String = "pc"): DataFrame = {
    MatVecDots.register(corpus.sparkSession)
    val meanLit = array(fit.mean.map(lit): _*)
    val scaled =
      if (whiten) fit.components.zip(fit.eigenvalues).map { case (c, ev) =>
        val s = 1.0 / math.sqrt(math.max(ev, 1e-12))
        c.map(_ * s)
      } else fit.components
    val mat = MatVecDots.matrixLit(scaled)
    corpus.select(col(idCol),
        zip_with(col(vecCol).cast("array<double>"), meanLit,
          (x, m) => x - m).as("centered"))
      .select(col(idCol), MatVecDots.matvec(col("centered"), mat).as(as))
  }
}
