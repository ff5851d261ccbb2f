package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the harness test data (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Scans go through the
  * DataSource V2 parquet reader, so Catalyst pushes filters and prunes
  * columns into the scan for free — callers should `select`/`filter`
  * as early as possible and let the optimizer do the rest.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for the SQL entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
