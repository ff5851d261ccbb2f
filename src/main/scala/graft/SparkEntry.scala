package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{FuzzQueries, OpsQueries, PipelineQueries,
  RelQueries, StatQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates per-module maps; every entry with a matching
  * [[oracleSql]] key is hash-compared against DuckDB on sf0.01 by the
  * driver's Verify pass; entries without one get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one true SQL entry point (Method_code.Rmd:763-772),
    * re-expressed over the harness star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.reportJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelQueries.queries ++ StatQueries.queries ++ OpsQueries.queries ++
      StreamQueries.queries ++ PipelineQueries.queries ++
      FuzzQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelQueries.oracles ++ StatQueries.oracles ++ OpsQueries.oracles ++
      StreamQueries.oracles ++ PipelineQueries.oracleSql ++
      FuzzQueries.oracles
}
