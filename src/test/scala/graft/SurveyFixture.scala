package graft

import breeze.linalg.DenseVector
import org.apache.spark.sql.DataFrame

import graft.stats.{Bootstrap, Em}

/** Deterministic synthetic two-survey fixture (FIXTURES.md A4): the
  * generative model is the reference's own bootstrap simulator
  * (`Method_code.Rmd:564-586`) — fixed (beta, sigma), v_i ~ N(0,sigma)
  * per area, y ~ Bernoulli(sigmoid(x'beta + v_i)).
  */
object SurveyFixture {
  val trueBeta: DenseVector[Double] = DenseVector(-0.4, 0.8, -0.6)
  val trueSigma = 0.5
  val truth: Em.Params = Em.Params(trueBeta, trueSigma * trueSigma)
  val featureCols = Seq("x1", "x2")

  /** Covariate frame: `numAreas` areas x `rowsPerArea` rows, plus id and
    * weight. Outcomes are added via Bootstrap.simulateOutcome.
    */
  def covariates(numAreas: Int, rowsPerArea: Int): DataFrame = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val rows = for {
      a <- 0 until numAreas
      j <- 0 until rowsPerArea
    } yield (f"A$a%02d", rng.nextDouble() * 2 - 1,
      if (rng.nextDouble() < 0.5) 0.0 else 1.0,
      0.5 + rng.nextDouble() * 1.5, a.toLong * 100000 + j)
    rows.toDF("state", "x1", "x2", "weight", "uid")
  }

  /** Small survey with simulated outcome under the true parameters. */
  def smallSurvey(numAreas: Int = 20, rowsPerArea: Int = 60): DataFrame = {
    val vB = Bootstrap.drawAreaEffects(
      (0 until numAreas).map(a => f"A$a%02d"), trueSigma, seed = 11L, b = 0)
    Bootstrap.simulateOutcome(covariates(numAreas, rowsPerArea), trueBeta,
      featureCols, "state", vB, Seq("uid"), seed = 11L, b = 0, yCol = "y")
  }
}
