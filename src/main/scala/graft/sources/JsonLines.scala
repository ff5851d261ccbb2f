package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink (beyond-reference format, next to CSV /
  * parquet / bucketed / partitioned): one JSON object per line, the
  * interchange format of most raw LLM-corpus drops (Common Crawl
  * derivatives, API exports) before they are compacted to parquet.
  *
  * Scale honesty: JSON scans are CPU-bound (per-row parse, no column
  * pruning at the byte level, no min/max pushdown) — the right role at
  * 100 TB is ingest-once-then-parquet, which is exactly the round-trip
  * the q29 gate exercises. Always pass an explicit schema on read:
  * schema inference is a full extra pass over the data, and PERMISSIVE
  * mode (the default) silently nulls malformed rows — add a
  * `_corrupt_record` column or FAILFAST when auditing a drop.
  */
object JsonLines {

  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").json(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
