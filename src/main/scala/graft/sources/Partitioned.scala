package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style partitioned parquet layout (beyond-reference
  * source/sink): rows are laid out as `path/key=value/part-*.parquet`
  * directories, so a reader filtering on the partition key lists and
  * opens ONLY the matching directories — the scan never touches the
  * other partitions' bytes. At 100 TB this is the first-line pruning
  * lever for time-series facts: partition by ingest date (or another
  * coarse, low-cardinality key) and every "last N days" query reads
  * N directories instead of the full history.
  *
  * Spark specifics this module pins down:
  *   - prune at the PLAN level: the executed scan must show the key
  *     under `PartitionFilters` (PlanSpec asserts q28's does). A filter
  *     that only appears under `PushedFilters`/`Filter` still reads
  *     every file's footer.
  *   - partition KEY cardinality must stay coarse (days, regions —
  *     never user ids): each distinct value is a directory, and a
  *     million tiny directories costs more in listing than the pruning
  *     saves. Pair with a pre-`repartition` on the key so each
  *     partition gets few, large files instead of one file per task
  *     per value.
  *   - the partition column's type is re-inferred from directory names
  *     on read (int-looking values come back int); keep keys integral
  *     or string to avoid surprises.
  */
object Partitioned {

  /** Write `df` partitioned by `key` (a derived Column, e.g.
    * `year(col("o_orderdate"))`) named `keyName`. The pre-repartition
    * on the key gives directory-per-value file layout with one file
    * per value per shuffle partition holding that value — at scale,
    * raise `spark.sql.shuffle.partitions` so files stay write-sized.
    */
  def write(df: DataFrame, key: Column, keyName: String,
            path: String): Unit =
    df.withColumn(keyName, key)
      .repartition(col(keyName))
      .write.mode("overwrite")
      .partitionBy(keyName)
      .parquet(path)

  /** Read a partitioned layout back; filters on the partition column
    * prune directories before any file is opened.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
