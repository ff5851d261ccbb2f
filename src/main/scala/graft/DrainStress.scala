package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-drain metadata stress (round-11) — the st16/st17 ingest drain
  * run for ~100 micro-batches, the regime where round-10's one `weak`
  * lived: per-batch enumeration of every historical high-water and
  * fp-store file turns a long-running ingest into O(batches²) metadata
  * work and an unbounded small-file swamp. This harness measures the
  * drain wall at a batch count where that growth is visible, so the
  * fix (single checkpointed high-water value + periodic fp-store
  * compaction) has a recorded before/after.
  *
  * Usage: sbt "runMain graft.DrainStress [numBatches] [rows]"
  * Results are recorded in BASELINE.md ("Round-11 long-drain").
  */
object DrainStress {
  def main(args: Array[String]): Unit = {
    val numBatches = args.headOption.map(_.toInt).getOrElse(100)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(5000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic crawl: ~4% exact re-crawls (same fp under a new id),
    // ~30% below the quality gate, event times striding forward with
    // occasional far-stale stragglers (the st17 quarantine regime)
    def docs = spark.range(rows.toLong).select(
      col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 7).cast("string")).as("source"),
      md5((col("id") - when(col("id") % 25 === 0, 5L).otherwise(0L))
        .cast("string")).as("fp"),
      (col("id") % 997 + 10).as("n_tokens"),
      round((col("id") % 100).cast("double") / 99.0, 6).as("q"),
      (lit(1700000000000L) + col("id") * 1000L
        - when(col("id") % 41 === 0, 86400000L).otherwise(0L)).as("ts"))

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[drain] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        s" ($n rows, $numBatches batches)")
    }

    val scratch = java.nio.file.Files
      .createTempDirectory("graft-drainstress").toString
    TempDirs.registerCleanedAtExit(scratch)

    timed("st16-shape long drain") {
      graft.streaming.Streams.corpusIngestDrain(
        docs.drop("ts"), s"$scratch/t16", numBatches = numBatches).count()
    }
    timed("st17-shape long drain (event-time, 30 s delay)") {
      graft.streaming.Streams.corpusIngestDrain(
        docs, s"$scratch/t17", numBatches = numBatches,
        eventTime = Some(("ts", 30000L))).count()
    }
    spark.stop()
  }
}
