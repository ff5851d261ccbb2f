package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Size-targeted parquet sink — the small-files countermeasure
  * (beyond-reference source/sink surface).
  *
  * The classic 100-TB failure mode: an upstream shuffle leaves a
  * DataFrame in thousands of partitions, a naive `.write` emits one
  * file per partition, and the table becomes millions of KB-sized
  * files whose listing/footer overhead dominates every later scan.
  * The Spark-first fix is NOT a hand-tuned `coalesce(n)` (n goes stale
  * the moment data volume changes): the REBALANCE hint plus AQE's
  * advisory partition size re-plans the pre-write exchange from the
  * actual runtime byte sizes, splitting skewed partitions and fusing
  * tiny ones, so output files track `targetBytes` at any scale with no
  * magic constants.
  */
object Compact {

  /** Write `df` as parquet whose files target `targetBytes` each,
    * regardless of the incoming partitioning.
    *
    * The advisory size is scoped to a CLONED session (same
    * SparkContext/cache, private SQLConf), reached through a global
    * temp view so the plan re-resolves under the write-local conf:
    * concurrent queries on the caller's session are never re-planned
    * with the altered advisory size, and concurrent Compact.write
    * calls can't restore a stale value over each other.
    */
  def write(df: DataFrame, path: String, targetBytes: Long): Unit = {
    val s = df.sparkSession
    val writer = s.newSession()
    writer.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      targetBytes.toString)
    val view = "graft_compact_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceGlobalTempView(view)
    try writer.table(s"global_temp.$view")
      .hint("rebalance").write.mode("overwrite").parquet(path)
    finally s.catalog.dropGlobalTempView(view)
  }

  /** Parquet part-file count under `path` (spec/gate helper). */
  def partFileCount(path: String): Int = {
    val d = new java.io.File(path)
    Option(d.listFiles()).map(_.count { f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")
    }).getOrElse(0)
  }

  /** Schema-evolution read: a parquet table whose older files lack
    * later columns is read with `mergeSchema` so all footers union into
    * one schema and missing columns surface as nulls — the "new
    * pipeline version added a column" situation every long-lived 100-TB
    * table hits. Spark prunes/pushes down through the merged schema as
    * usual; the cost is one footer read per file at planning, so pair
    * with [[write]]-sized files, not millions of tiny ones.
    */
  def readMerged(s: SparkSession, paths: String*): DataFrame =
    s.read.option("mergeSchema", "true").parquet(paths: _*)
}
