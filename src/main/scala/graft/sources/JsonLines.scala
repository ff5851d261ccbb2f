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

  /** Auditing read: PERMISSIVE parse with the raw line of every
    * malformed row captured in `corruptCol` (valid rows carry null
    * there). One bad line can NOT kill a 100 TB ingest, and it can NOT
    * silently vanish either — route `corruptCol IS NOT NULL` to a
    * quarantine sink and reconcile counts. Built as a text scan +
    * `from_json` rather than `spark.read.json` with a corrupt-record
    * schema: the raw-file form throws QUERY_ONLY_CORRUPT_RECORD_COLUMN
    * whenever column pruning reduces the scan to the corrupt column
    * alone (e.g. a downstream count grouped on validity), while the
    * parse-an-attribute form has no such restriction — same codegen'd
    * JacksonParser either way, one pass, no caching required.
    */
  def readAudit(spark: SparkSession, path: String, schema: StructType,
                corruptCol: String = "_corrupt_record"): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    val withCorrupt = schema.add(corruptCol,
      org.apache.spark.sql.types.StringType)
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
      .select("j.*")
  }
}
