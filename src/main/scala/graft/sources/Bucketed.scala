package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed parquet tables (beyond-reference source/sink): pay the
  * shuffle ONCE at write time — rows are hash-partitioned into `buckets`
  * files per the bucket key — so every later join or aggregation on
  * that key runs with ZERO exchange on the bucketed side. At 100 TB
  * this is the difference between re-shuffling the fact table on every
  * query and never shuffling it again: the canonical layout for a fact
  * table that is joined on the same key by many downstream queries.
  *
  * Spark specifics this module pins down:
  *   - bucket assignment is `murmur3(key) pmod buckets` — the SAME hash
  *     family `repartition(n, col)` uses, so pre-repartitioning by the
  *     key yields exactly ONE file per bucket instead of
  *     (writeTasks x buckets) small files. At scale, size `buckets` so
  *     one bucket (~totalBytes/buckets) fits an executor's read slice.
  *   - both join sides must share the bucket count for the exchange to
  *     be elided; `sortBy` inside each bucket additionally lets the
  *     sort-merge join skip its in-partition sort when each bucket is a
  *     single sorted file.
  *   - table metadata lives in the session catalog (in-memory here; a
  *     metastore on a cluster) — data files are plain parquet at `path`.
  */
object Bucketed {

  /** Write `df` as a bucketed external parquet table named `table` at
    * `path`, bucketed AND sorted by `key` into `buckets` buckets. The
    * pre-repartition gives file-per-bucket layout (see object doc).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket keys with no
    * exchange on either side. The merge hint forces sort-merge (a
    * broadcast pick on small test data would hide the co-location
    * being demonstrated); the executed plan must show SortMergeJoin
    * with zero Exchange below it — PlanSpec asserts exactly that.
    * Inner join: bucketed co-location is equally valid for outer
    * flavors, callers pass `joinType` as needed.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                    rightTable: String, rightKey: String,
                    joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r.hint("merge"),
      l(leftKey) === r(rightKey), joinType)
  }
}
