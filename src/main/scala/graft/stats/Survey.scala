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
