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
  * Round-12 adds the BATCH-VOLUME axis (`volume` mode): fixed batch
  * count, docs-per-batch scaled 1x/10x/100x, driving
  * [[graft.streaming.Streams.ingestBatch]] directly (the commit path
  * under test, without the streaming engine's per-trigger constant or
  * the harness's own source-split writes). Per-batch wall must grow
  * ~linearly in volume — the single-task `coalesce(1)` fp-append and
  * quarantine writes this axis guards against would bend it
  * super-linear once one task serializes a growing write.
  *
  * Usage: sbt "runMain graft.DrainStress [numBatches] [rows]"
  *        sbt "runMain graft.DrainStress volume [batches] [baseRows]"
  * Results are recorded in BASELINE.md ("Round-11 long-drain",
  * "Round-12 batch-volume").
  */
object DrainStress {

  /** `volume` mode: three runs per drain shape at 1x/10x/100x
    * docs-per-batch, fixed batch count. Prints wall, committed rows,
    * and the max per-batch metadata reads (must stay flat — the
    * volume axis must not regress the batch-count axis).
    */
  private def volumeMode(spark: SparkSession, numBatches: Int,
                         baseRows: Int): Unit = {
    import graft.streaming.Streams
    def run(rowsPerBatch: Int, eventTime: Boolean): Unit = {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-drainvol").toString
      TempDirs.registerCleanedAtExit(scratch)
      val root = s"$scratch/t"
      val storeDir = s"$scratch/store"
      new java.io.File(storeDir).mkdirs()
      Streams.drainMetaReads.clear()
      val t0 = System.nanoTime()
      (0 until numBatches).foreach { k =>
        val base = k.toLong * rowsPerBatch
        val batch = spark.range(base, base + rowsPerBatch).select(
          col("id").as("doc_id"),
          concat(lit("src"), (col("id") % 7).cast("string")).as("source"),
          md5((col("id") - when(col("id") % 25 === 0, 5L).otherwise(0L))
            .cast("string")).as("fp"),
          (col("id") % 997 + 10).as("n_tokens"),
          round((col("id") % 100).cast("double") / 99.0, 6).as("q"),
          (lit(1700000000000L) + col("id") * 10L
            - when(col("id") % 41 === 0, 86400000L).otherwise(0L))
            .as("ts"))
          .withColumn("__b", lit(k))
        Streams.ingestBatch(
          if (eventTime) batch else batch.drop("ts"),
          k.toLong, root, storeDir, 128L << 20,
          if (eventTime) Some(("ts", 30000L)) else None,
          compactEvery = 8)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val n = Streams.corpusAttribution(spark, root).count()
      val reads = {
        val it = Streams.drainMetaReads.iterator()
        var m = 0
        while (it.hasNext) m = math.max(m, it.next().intValue())
        m
      }
      val shape = if (eventTime) "st17-shape" else "st16-shape"
      println(f"[drain-vol] $shape rowsPerBatch=$rowsPerBatch " +
        f"batches=$numBatches: $wall%.1f s ($n rows, maxMetaReads=$reads)")
    }
    Seq(1, 10, 100).foreach { mult =>
      run(baseRows * mult, eventTime = false)
      run(baseRows * mult, eventTime = true)
    }
  }

  def main(args: Array[String]): Unit = {
    val volume = args.headOption.contains("volume")
    val posArgs = if (volume) args.drop(1) else args
    val numBatches = posArgs.headOption.map(_.toInt)
      .getOrElse(if (volume) 20 else 100)
    val rows = posArgs.drop(1).headOption.map(_.toInt)
      .getOrElse(if (volume) 5000 else 5000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (volume) {
      volumeMode(spark, numBatches, rows)
      spark.stop()
      return
    }

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
