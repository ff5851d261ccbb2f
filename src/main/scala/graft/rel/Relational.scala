package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational building blocks (SURVEY.md §2.3-2.6: F*, J*, A*, D*, U*).
  *
  * Every reference loop-over-groups (`Method_code.Rmd:188-204` etc.)
  * becomes one `groupBy` = one shuffle; every per-state filter inside a
  * loop (F3) disappears into the grouping key. Joins against small
  * (dimension-sized) sides are left to Catalyst/AQE, which picks
  * BroadcastHashJoin for anything under the broadcast threshold — the
  * `state`-keyed tables this mirrors are <=51 rows (SURVEY.md §2.4 note).
  */
object Relational {

  /** Grouped weighted mean: sum(y*w)/sum(w) per group, optionally scaled.
    * Reference A1/A2 (`Method_code.Rmd:188-204,437-452`). One shuffle on
    * the grouping keys; partial aggregation (map-side combine) is
    * Catalyst-automatic since sum/sum is algebraic.
    */
  def weightedMean(df: DataFrame, groupCols: Seq[String], y: Column,
                   w: Column, scale: Double = 1.0,
                   as: String = "wmean"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg((lit(scale) * sum(y * w) / sum(w)).as(as))

  /** Chained full outer join on a shared key (reference J1,
    * `Method_code.Rmd:466-469`: `reduce(full_join, by='state')`).
    * 51-vs-49-key asymmetry yields nulls, exactly as the reference.
    */
  def fullOuterChain(dfs: Seq[DataFrame], key: String): DataFrame =
    dfs.reduce(_.join(_, Seq(key), "full_outer"))

  /** UNION ALL by column name (reference U1/U2, rbind). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_.unionByName(_))

  /** Distinct sorted key list (reference D1, `sort(unique(df$state))`).
    * Collecting is only legal for dimension-sized key domains (the
    * reference's 51 states); never call on a high-cardinality key.
    */
  def distinctSorted(df: DataFrame, key: String): Seq[String] =
    df.select(key).distinct().orderBy(key).collect().map(_.getString(0)).toSeq

  /** Global deviation summaries between an estimate and a truth column
    * (reference A4, `Method_code.Rmd:479-508`): ASD = mean squared
    * deviation, RASD = sqrt(ASD), AAD = mean absolute deviation. Nulls
    * (unmatched full-outer rows) are skipped natively by Spark aggs,
    * mirroring the reference's `na.rm=TRUE`.
    */
  def deviationSummary(df: DataFrame, est: Column, truth: Column): DataFrame =
    df.agg(
      avg(pow(est - truth, 2)).as("asd"),
      sqrt(avg(pow(est - truth, 2))).as("rasd"),
      avg(abs(est - truth)).as("aad"))

  /** Product aggregate in log space (reference A11,
    * `Method_code.Rmd:254-256` multiplies raw probabilities — underflows;
    * SURVEY.md Q3 mandates log space). Requires strictly positive inputs.
    */
  def productAgg(x: Column): Column = exp(sum(log(x)))
}
