package graft

import org.apache.spark.sql.functions._

import graft.ops.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Anisotropic Gaussian fixture: variance 9 along a planted unit
    * direction, variance ~0.01 isotropic noise elsewhere, plus a
    * nonzero mean — PCA must recover the direction, the spectrum, and
    * remove the mean.
    */
  private lazy val planted: (Array[Double], org.apache.spark.sql.DataFrame) = {
    val dim = 16
    val rng = new scala.util.Random(7L)
    val dirRaw = Array.fill(dim)(rng.nextGaussian())
    val n0 = math.sqrt(dirRaw.map(x => x * x).sum)
    val dir = dirRaw.map(_ / n0)
    val mean = Array.tabulate(dim)(i => 0.5 * (i % 3))
    val rows = (0L until 2000L).map { i =>
      val t = 3.0 * rng.nextGaussian()
      val v = Array.tabulate(dim)(d =>
        mean(d) + t * dir(d) + 0.1 * rng.nextGaussian())
      (i, v.toSeq)
    }
    (dir, rows.toDF("id", "v"))
  }

  test("fit recovers the planted principal direction and spectrum") {
    val (dir, df) = planted
    val fit = Pca.fit(df, "v", dim = 16, r = 3)
    val c0 = fit.components(0)
    val cos = c0.zip(dir).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"|cos|=${math.abs(cos)}")
    // spectrum: ~9 + noise for the top, ~0.01 for the rest
    assert(fit.eigenvalues(0) > 7.0 && fit.eigenvalues(0) < 11.0,
      s"eig=${fit.eigenvalues.toSeq}")
    assert(fit.eigenvalues(1) < 0.05)
    // components orthonormal
    for (i <- 0 until 3; j <- 0 until 3) {
      val d = fit.components(i).zip(fit.components(j))
        .map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"<c$i,c$j>=$d")
    }
  }

  test("whitened projection has unit variance and zero mean per component") {
    val (_, df) = planted
    val fit = Pca.fit(df, "v", dim = 16, r = 3)
    val proj = Pca.project(df, "id", "v", fit, whiten = true)
    val stats = proj.select(
        (0 until 3).map(i => element_at(col("pc"), i + 1).as(s"c$i")): _*)
      .agg(avg("c0").as("m0"), var_samp("c0").as("v0"),
        avg("c1").as("m1"), var_samp("c1").as("v1"),
        avg("c2").as("m2"), var_samp("c2").as("v2"))
      .head()
    for (i <- 0 until 3) {
      assert(math.abs(stats.getDouble(2 * i)) < 1e-6,
        s"mean c$i = ${stats.getDouble(2 * i)}")
      assert(math.abs(stats.getDouble(2 * i + 1) - 1.0) < 1e-6,
        s"var c$i = ${stats.getDouble(2 * i + 1)}")
    }
  }

  test("fit is invariant to partitioning (canonical sign, stable eig)") {
    val (_, df) = planted
    val a = Pca.fit(df.repartition(1), "v", dim = 16, r = 2)
    val b = Pca.fit(df.repartition(13), "v", dim = 16, r = 2)
    a.eigenvalues.zip(b.eigenvalues).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-8, s"$x vs $y")
    }
    a.components.zip(b.components).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6, s"$x vs $y")
      }
    }
  }

  test("fit consumes exactly covarianceDf's moments: eig over the " +
    "s26 upper-triangle rows reproduces fit's spectrum and components") {
    import breeze.linalg.{eigSym, DenseMatrix}
    val (_, df) = planted
    val dim = 16
    val fit = Pca.fit(df, "v", dim = dim, r = 3)
    val rows = Pca.covarianceDf(df, "v", dim).collect()
      .map(r => ((r.getInt(0) - 1, r.getInt(1) - 1), r.getDouble(2)))
      .toMap
    assert(rows.size == dim * (dim + 1) / 2)
    // symmetric completion of the upper triangle -> the SAME matrix
    // fit hands to eigSym (momentsPass is the shared source of truth)
    val cov = DenseMatrix.tabulate(dim, dim) { (i, j) =>
      if (i <= j) rows((i, j)) else rows((j, i))
    }
    val es = eigSym(cov)
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i))
    fit.eigenvalues.zipWithIndex.foreach { case (ev, k) =>
      assert(math.abs(ev - es.eigenvalues(order(k))) < 1e-10,
        s"eig $k: fit=$ev s26=${es.eigenvalues(order(k))}")
    }
    assert(math.abs(
      (0 until dim).map(es.eigenvalues(_)).sum - fit.totalVariance)
      < 1e-10)
    fit.components.zipWithIndex.foreach { case (c, k) =>
      val v0 = Array.tabulate(dim)(d => es.eigenvectors(d, order(k)))
      val pivot = v0.indices.maxBy(i => math.abs(v0(i)))
      val v = if (v0(pivot) < 0) v0.map(-_) else v0
      c.zip(v).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-8, s"component $k: $a vs $b")
      }
    }
  }

  test("projection without whitening is the centered coordinate") {
    // 2-D exact check: data on a line along e1, mean removed
    val df = Seq((0L, Seq(1.0, 5.0)), (1L, Seq(3.0, 5.0)),
      (2L, Seq(5.0, 5.0))).toDF("id", "v")
    val fit = Pca.fit(df, "v", dim = 2, r = 1)
    assert(math.abs(fit.components(0)(0)) > 0.999)
    val pcs = Pca.project(df, "id", "v", fit).orderBy("id")
      .select(element_at(col("pc"), 1)).as[Double].collect()
    assert(pcs.zip(Seq(-2.0, 0.0, 2.0)).forall {
      case (g, e) => math.abs(math.abs(g) - math.abs(e)) < 1e-9 })
  }

  test("s26 signed-zero guard: round(cov, 6) + 0.0 never emits -0.0, " +
    "and Catalyst does not fold the + 0.0 away") {
    // The round-13 driver-hash failure: a near-zero covariance whose
    // sign is decided by sum-order ulps rounds to -0.0 on one engine
    // and +0.0 on the other; 6dp rounding keeps the sign bit, and the
    // driver hashes BYTES. The pinned entry's contract is therefore
    // `round(c, 6) + 0.0` on both sides — IEEE (-0.0) + 0.0 = +0.0.
    // First prove the Column expression survives optimization: a
    // literal -0.0 through the exact s26 projection must come out
    // bit-positive (this would fail if Catalyst ever "simplified"
    // x + 0.0 to x).
    val neg = Seq(-0.0, -1.0e-9, 0.0, 1.25, -2.5e-7).toDF("c")
      .select((round(col("c"), 6) + lit(0.0)).as("cov"))
      .collect().map(_.getDouble(0))
    neg.foreach { v =>
      assert(java.lang.Double.doubleToRawLongBits(v) !=
        java.lang.Double.doubleToRawLongBits(-0.0),
        s"emitted -0.0 bit pattern for $v")
    }
    assert(neg(0) == 0.0 && neg(1) == 0.0 && neg(3) == 1.25)
    // Then gate the real path: a fixture with an exactly-cancelling
    // column pair (cov(i,j) sums to a tiny NEGATIVE value that rounds
    // to zero) still emits +0.0 through the s26 projection.
    val dim = 4
    val rows = (0 until 8).map { i =>
      val s = if (i % 2 == 0) 1.0 else -1.0
      // col 0 vs col 1: anti-correlated by a sub-rounding amount
      (i.toLong, Seq(s * 1e-5, -s * 1e-5 - 1e-12, i.toDouble, 1.0))
    }
    val df = rows.toDF("id", "v")
    val covs = Pca.covarianceDf(df, "v", dim)
      .select(col("i"), col("j"),
        (round(col("cov"), 6) + lit(0.0)).as("cov"))
      .collect()
    assert(covs.length == dim * (dim + 1) / 2)
    covs.foreach { r =>
      val bits = java.lang.Double.doubleToRawLongBits(r.getDouble(2))
      assert(bits != java.lang.Double.doubleToRawLongBits(-0.0),
        s"s26 projection emitted -0.0 at (${r.getInt(0)},${r.getInt(1)})")
    }
    // the (1,2) cell is the engineered near-zero-negative: it must be
    // exactly +0.0 after the guard
    val c12 = covs.find(r => r.getInt(0) == 1 && r.getInt(1) == 2).get
    assert(c12.getDouble(2) == 0.0)
  }

  // ---- jacobiStep (pinned as s31) ------------------------------------

  private def upperOf(m: Seq[(Int, Int, Double)]): Map[(Int, Int), Double] =
    m.map(t => (t._1, t._2) -> t._3).toMap

  private def frob(a: Map[(Int, Int), Double]): Double =
    a.map { case ((i, j), v) =>
      if (i == j) v * v else 2.0 * v * v }.sum

  private def maxOff(a: Map[(Int, Int), Double]): ((Int, Int), Double) =
    a.filter { case ((i, j), _) => i < j }
      .maxBy { case ((i, j), v) => (math.abs(v), -i, -j) }

  test("jacobiStep: zeroes the selected pivot, preserves the Frobenius " +
      "norm, strictly shrinks off-diagonal mass, matches a hand-rotated " +
      "3x3") {
    // hand-checkable 3x3: pivot must be (1,2) (|4| largest off-diag)
    val a = Map((1, 1) -> 2.0, (1, 2) -> 4.0, (1, 3) -> 1.0,
      (2, 2) -> 2.0, (2, 3) -> 0.5, (3, 3) -> 7.0)
    val (out, (p, q)) = Pca.jacobiStep(a, 3)
    assert((p, q) == (1, 2))
    val m = upperOf(out)
    assert(m((1, 2)) == 0.0)
    // theta = 0 => t = 1, c = s = 1/sqrt(2): eigenpair (2±4) = (6, -2)
    assert(math.abs(m((1, 1)) - (-2.0)) < 1e-12)
    assert(math.abs(m((2, 2)) - 6.0) < 1e-12)
    assert(math.abs(frob(m) - frob(a)) < 1e-9 * frob(a))
    val offBefore = a.collect { case ((i, j), v) if i < j => v * v }.sum
    val offAfter = m.collect { case ((i, j), v) if i < j => v * v }.sum
    assert(offAfter < offBefore)
  }

  test("jacobiStep iterated to convergence reproduces eigSym's spectrum " +
      "over the s26 matrix — the pinned step IS the eigensolver's step") {
    import breeze.linalg.{eigSym, DenseMatrix}
    val rows = SparkEntry.queries("s26_pca_moments")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    var m = upperOf(rows.toIndexedSeq)
    val f0 = frob(m)
    var steps = 0
    while (math.abs(maxOff(m)._2) > 1e-9 && steps < 30000) {
      m = upperOf(Pca.jacobiStep(m, 64)._1)
      steps += 1
    }
    assert(math.abs(maxOff(m)._2) <= 1e-9, s"no convergence in $steps")
    assert(math.abs(frob(m) - f0) < 1e-9 * math.max(f0, 1.0))
    val got = (1 to 64).map(i => m((i, i))).sorted
    val dm = DenseMatrix.tabulate(64, 64) { (i, j) =>
      val (a, b) = (math.min(i, j) + 1, math.max(i, j) + 1)
      upperOf(rows.toIndexedSeq)((a, b))
    }
    val want = eigSym(dm).eigenvalues.toArray.sorted
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-7 * math.max(math.abs(w), 1.0),
        s"eigenvalue diverged: $g vs $w") }
  }

  test("s31 registry entry: pivot cell is exactly +0.0 and the frame " +
      "equals jacobiStep over the s26 relay") {
    val s26 = SparkEntry.queries("s26_pca_moments")(spark, sf001)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    val (want, (p, q)) = Pca.jacobiStep(s26, 64)
    val got = SparkEntry.queries("s31_jacobi_step_pinned")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    val pivot = got.find(t => t._1 == p && t._2 == q).get._3
    assert(pivot == 0.0 &&
      java.lang.Double.doubleToRawLongBits(pivot) == 0L)
  }

  test("s32 registry entry: equals jacobiSteps(iters = 2) over the s26 " +
      "relay, off-diagonal mass shrinks strictly at each step, and the " +
      "Frobenius norm is conserved across the chain") {
    val s26 = SparkEntry.queries("s26_pca_moments")(spark, sf001)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    val (after1, p1) = Pca.jacobiStep(s26, 64)
    val m1 = upperOf(after1)
    val (want, pivots) = Pca.jacobiSteps(s26, 64, iters = 2)
    assert(pivots.head == p1)
    val got = SparkEntry.queries("s32_jacobi_two_steps")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == 2080)
    // bit-for-bit: the registry entry IS the two-step fold
    got.foreach { case (i, j, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(want((i, j))),
        s"cell ($i,$j) diverged from the fold") }
    def off(a: Map[(Int, Int), Double]): Double =
      a.collect { case ((i, j), v) if i < j => v * v }.sum
    val m2 = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(off(m1) < off(s26) && off(m2) < off(m1))
    assert(math.abs(frob(m2) - frob(s26)) < 1e-9 * frob(s26))
    // both pivot cells landed at exactly +0.0 unless re-rotated; the
    // SECOND pivot is guaranteed still zero
    val (p2a, p2b) = pivots(1)
    val z = m2((p2a, p2b))
    assert(z == 0.0 && java.lang.Double.doubleToRawLongBits(z) == 0L)
  }
}
