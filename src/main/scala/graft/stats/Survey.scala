package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Design-based survey estimation (SURVEY.md A3/M6).
  *
  * Mirrors `svydesign(id=~ID, weights=~weight)` + `svyby(..., svymean)`
  * (`Method_code.Rmd:459-463`): each row is its own PSU, so the design
  * variance of the weighted ratio mean reduces to the linearized
  * (Taylor) form
  *
  *   mu_g    = sum(w*y)/sum(w)
  *   Var(mu) = n/(n-1) * sum(w^2 (y-mu)^2) / (sum w)^2
  *
  * (the n/(n-1) factor is survey-package `svyrecvar`'s with-replacement
  * PSU correction). Implemented as a single-pass aggregate using the
  * algebraic identity sum(w^2 (y-mu)^2) = sum(w^2 y^2) - 2 mu sum(w^2 y)
  * + mu^2 sum(w^2) — one shuffle, no self-join, codegen-friendly.
  */
object Survey {

  /** Survey raking / iterative proportional fitting (the
    * `survey::rake` companion to [[weightedMeanSE]]'s svyby): scale
    * row weights so the weighted margins match known population totals
    * over each margin variable in turn, cycling `iters` times. Each
    * `margins` entry is (category column, targets DataFrame carrying
    * that column + a `_target` total); one IPF pass multiplies every
    * row's weight by target/current for its category.
    *
    * Scale shape: per margin per iteration, ONE map-side-combining
    * groupBy for the current margin sums and two BROADCAST joins
    * (margin tables are category-dimension-sized by definition) — the
    * data never shuffles, weights update in a narrow projection.
    * Convergence is the classical IPF result (margins are matched
    * exactly for the LAST margin of the final cycle and geometrically
    * closer for earlier ones); a fixed small `iters` is the standard
    * practice. Any category with sample rows has a positive weight
    * sum, so the scaling ratio is always defined.
    */
  def rake(df: DataFrame, weightCol: String,
           margins: Seq[(String, DataFrame)], iters: Int): DataFrame = {
    var cur = df
    var it = 0
    while (it < iters) {
      margins.foreach { case (c, tgt) =>
        val sums = cur.groupBy(c).agg(sum(weightCol).as("_cursum"))
        cur = cur.join(broadcast(sums), c)
          .join(broadcast(tgt), c)
          .withColumn(weightCol,
            col(weightCol) * col("_target") / col("_cursum"))
          .drop("_cursum", "_target")
      }
      it += 1
    }
    cur
  }

  def weightedMeanSE(df: DataFrame, groupCol: String, yCol: String,
                     wCol: String, scale: Double = 1.0): DataFrame = {
    val y = col(yCol).cast("double")
    val w = col(wCol).cast("double")
    df.filter(y.isNotNull)
      .groupBy(groupCol)
      .agg(
        sum(y * w).as("swy"), sum(w).as("sw"),
        sum(w * w * y * y).as("swwyy"), sum(w * w * y).as("swwy"),
        sum(w * w).as("sww"), count(lit(1)).as("n"))
      .select(
        col(groupCol),
        (lit(scale) * col("swy") / col("sw")).as("mean"),
        (lit(scale) * sqrt(
          (col("n") / (col("n") - lit(1.0))) *
            (col("swwyy") - lit(2.0) * (col("swy") / col("sw")) * col("swwy")
              + pow(col("swy") / col("sw"), 2) * col("sww"))
            / pow(col("sw"), 2))).as("se"))
  }
}
