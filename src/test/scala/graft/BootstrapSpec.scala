package graft

import org.apache.spark.sql.functions._

import graft.stats.Bootstrap

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("keyedUniform is deterministic and partitioning-invariant") {
    val df = (1L to 1000L).toDF("uid")
    val u1 = df.withColumn("u", Bootstrap.keyedUniform(Seq("uid"), 9L, 1))
      .orderBy("uid").select("u").as[Double].collect()
    val u2 = df.repartition(7).withColumn("u",
        Bootstrap.keyedUniform(Seq("uid"), 9L, 1))
      .orderBy("uid").select("u").as[Double].collect()
    assert(u1.toSeq == u2.toSeq)
    assert(u1.forall(u => u >= 0 && u < 1))
    val mean = u1.sum / u1.length
    assert(math.abs(mean - 0.5) < 0.05, s"mean=$mean")
    // different replicate id -> different stream
    val u3 = df.withColumn("u", Bootstrap.keyedUniform(Seq("uid"), 9L, 2))
      .orderBy("uid").select("u").as[Double].collect()
    assert(u1.toSeq != u3.toSeq)
  }

  test("simulateOutcome produces calibrated Bernoulli rates") {
    val cov = SurveyFixture.covariates(numAreas = 4, rowsPerArea = 500)
    val sim = Bootstrap.simulateOutcome(cov, SurveyFixture.trueBeta,
      SurveyFixture.featureCols, "state", Map.empty, Seq("uid"), 21L, 0)
    // empirical rate should track mean predicted probability
    val r = sim.agg(avg("y_sim"), avg(graft.etl.Encodings.sigmoid(
        graft.stats.Glmm.xBetaCol(SurveyFixture.trueBeta,
          SurveyFixture.featureCols)))).as[(Double, Double)].head()
    assert(math.abs(r._1 - r._2) < 0.03, s"empirical=${r._1} expected=${r._2}")
  }

  test("mspe runs end-to-end and yields positive finite values") {
    val small = SurveyFixture.covariates(numAreas = 8, rowsPerArea = 40)
    val big = SurveyFixture.covariates(numAreas = 8, rowsPerArea = 80)
    val m = Bootstrap.mspe(small, big, "y", SurveyFixture.featureCols,
      "state", "weight", Seq("uid"), SurveyFixture.truth, numB = 2,
      seed = 3L, numDraws = 50, emIters = 2, ebpDraws = 25)
      .orderBy("state").as[(String, Double)].collect()
    assert(m.length == 8)
    assert(m.forall { case (_, v) => v > 0 && v.isFinite && v < 50 })
  }

  test("mspe refits the logistic initializer per replicate (Rmd:602-607)") {
    // the refit path must actually be exercised: seeding EM from a
    // replicate-specific glm fit vs from the truth params changes the
    // replicate estimates, hence the MSPE
    val small = SurveyFixture.covariates(numAreas = 6, rowsPerArea = 40)
    val big = SurveyFixture.covariates(numAreas = 6, rowsPerArea = 60)
    def run(refit: Boolean) =
      Bootstrap.mspe(small, big, "y", SurveyFixture.featureCols,
        "state", "weight", Seq("uid"), SurveyFixture.truth, numB = 1,
        seed = 13L, numDraws = 30, emIters = 1, ebpDraws = 10,
        refitInit = refit)
        .orderBy("state").as[(String, Double)].collect().toSeq
    val withRefit = run(true)
    val withoutRefit = run(false)
    assert(withRefit.map(_._1) == withoutRefit.map(_._1))
    assert(withRefit != withoutRefit,
      "refitInit had no effect — per-replicate refit not exercised")
    assert(withRefit.forall { case (_, v) => v > 0 && v.isFinite })
  }
}
