package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 hot-key skew stress (round-10) — the real-crawl failure mode
  * planted into the GenScale corpus and driven through both ingest
  * surfaces end to end:
  *
  *   - p01: ~10% of the docs become ONE near-dup boilerplate cluster
  *     (shared 200-token text + per-doc salt token, so fingerprints
  *     DIFFER — exact dedup keeps all of them and the fuzzy stage
  *     must absorb the cluster). The chain's LSH bucket budget
  *     ([[graft.queries.PipelineQueries.LshBucketBudget]]) must fire,
  *     the p02 funnel must REPORT it, and the closure must still
  *     collapse the cluster.
  *   - st16 shape: ~10% of docs become EXACT copies (one hot
  *     fingerprint) — the in-batch combinable groupBy + capped store
  *     probe must absorb it with exactly one survivor.
  *
  * Usage: sbt "runMain graft.SkewStress /tmp/graft-sf1"
  * Results are recorded in BASELINE.md ("Round-10 sf1 skew stress");
  * the oracle-gated twin of the budget path is p04_lsh_skew_budget.
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val skewDir = sfDir + "-skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // build the skewed documents table once: every 10th doc's text is
    // replaced by boilerplate + a per-doc salt token
    if (!new java.io.File(s"$skewDir/documents.parquet").exists()) {
      new java.io.File(skewDir).mkdirs()
      val boiler = (0 until 200).map(i => "boiler" + i).mkString(" ")
      Tables(spark, sfDir, "documents")
        .withColumn("text",
          when(col("doc_id") % 10 === 0,
            concat(lit(boiler), lit(" salt"),
              col("doc_id").cast("string")))
            .otherwise(col("text")))
        .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
    }

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[skew] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val p01 = timed("p01 skew chain (LSH budget + closure) rows+wall") {
      graft.queries.PipelineQueries.queries("p01_corpus_pipeline")(
        spark, skewDir).count()
    }
    println(s"[skew] p01 final rows: $p01")
    spark.catalog.clearCache()

    val funnel = timed("p02 skew funnel wall") {
      graft.queries.PipelineQueries.queries("p02_pipeline_funnel")(
        spark, skewDir).collect()
    }
    funnel.foreach(r => println(s"[skew] funnel ${r.mkString(" | ")}"))
    spark.catalog.clearCache()

    // st16-shape drain with one hot EXACT fingerprint (10% of corpus)
    val hot = Tables(spark, sfDir, "documents")
      .withColumn("text",
        when(col("doc_id") % 10 === 0, lit("the same boilerplate page"))
          .otherwise(col("text")))
    val scored = hot.select(col("doc_id"), col("source"),
      graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"),
      round(graft.ops.TextAnalysis.qualityScoreOf(
        graft.ops.TextAnalysis.tokens(lower(col("text"))),
        col("text")), 6).as("q"))
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-skew-st16").toString
    TempDirs.registerCleanedAtExit(scratch)
    val root = scratch + "/t"
    val st16 = timed("st16 hot-fp drain (4 commits) rows+wall") {
      graft.streaming.Streams.corpusIngestDrain(scored, root,
        numBatches = 4).count()
    }
    println(s"[skew] st16 attributed rows: $st16")
    val hotFp = graft.ops.TextAnalysis.fingerprint(
      lit("the same boilerplate page"))
    val hotSurvivors = graft.sources.Versioned
      .readAsOf(spark, root,
        graft.sources.Versioned.latestVersion(root))
      .filter(col("fp") === hotFp).count()
    println(s"[skew] hot-fp survivors in corpus (must be 1): $hotSurvivors")
    spark.stop()
  }
}
