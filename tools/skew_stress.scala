// sf1 hot-key skew stress (round-10 verdict item 7) — run with:
//   sbt console < tools/skew_stress.scala
// Plants the real-crawl failure mode into the GenScale sf1 corpus and
// drives the two ingest surfaces end to end:
//   p01: ~10% of the 50k docs become ONE near-dup boilerplate cluster
//        (shared 200-token text + per-doc salt token -> fingerprints
//        DIFFER, exact dedup keeps all 5k, the fuzzy stage must absorb
//        them). The chain's LSH bucket budget (LshBucketBudget = 4096)
//        must fire and the closure must still collapse the cluster.
//   st16: ~10% of docs become EXACT copies (one hot fingerprint) —
//        the in-batch combinable groupBy + store probe must absorb it.
// Results are recorded in BASELINE.md ("Round-10 sf1 skew stress").
import org.apache.spark.sql.functions._
import graft._

val spark = org.apache.spark.sql.SparkSession.builder()
  .master("local[16]")
  .config("spark.sql.shuffle.partitions", "32")
  .config("spark.sql.session.timeZone", "UTC")
  .config("spark.ui.enabled", "false")
  .config("spark.sql.legacy.parquet.nanosAsLong", "true")
  .getOrCreate()
spark.sparkContext.setLogLevel("WARN")

val sf1 = "/tmp/graft-sf1"
val skewDir = "/tmp/graft-sf1-skew"

// build the skewed documents table once: every 10th doc's text is
// replaced by boilerplate + a per-doc salt token
val d = new java.io.File(skewDir)
if (!d.exists()) {
  d.mkdirs()
  val boiler = (0 until 200).map(i => "boiler" + i).mkString(" ")
  val docs = Tables(spark, sf1, "documents")
  docs.withColumn("text",
      when(col("doc_id") % 10 === 0,
        concat(lit(boiler), lit(" salt"), col("doc_id").cast("string")))
        .otherwise(col("text")))
    .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
  // other tables pass through unchanged (chain only reads documents,
  // but Tables resolves per-table files from the same dir)
  Seq("region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings").foreach { t =>
    val src = new java.io.File(s"$sf1/$t.parquet")
    if (src.exists())
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(s"$skewDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

def timed[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[skew] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
  r
}

// p01 through the capped chain on the skewed corpus
val p01 = timed("p01 sf1 skew (chain + LSH budget + closure)") {
  graft.queries.PipelineQueries.queries("p01_corpus_pipeline")(
    spark, skewDir).count()
}
println(s"[skew] p01 final rows: $p01")

// the funnel reports the budget activity — NEVER silent
val funnel = graft.queries.PipelineQueries.queries("p02_pipeline_funnel")(
  spark, skewDir).collect()
funnel.foreach(r => println(s"[skew] funnel ${r.mkString(" | ")}"))

// st16-shape drain with one hot EXACT fingerprint (10% of corpus)
val docs = Tables(spark, sf1, "documents")
val hot = docs.withColumn("text",
  when(col("doc_id") % 10 === 0, lit("the same boilerplate page"))
    .otherwise(col("text")))
val scored = hot.select(col("doc_id"), col("source"),
  graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
  graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
    .as("n_tokens"),
  round(graft.ops.TextAnalysis.qualityScoreOf(
    graft.ops.TextAnalysis.tokens(lower(col("text"))), col("text")), 6)
    .as("q"))
val root = java.nio.file.Files
  .createTempDirectory("graft-skew-st16").toString + "/t"
val st16 = timed("st16 sf1 hot-fp drain (4 commits)") {
  graft.streaming.Streams.corpusIngestDrain(scored, root,
    numBatches = 4).count()
}
println(s"[skew] st16 final+attributed rows: $st16")
val hotSurvivors = graft.sources.Versioned
  .readAsOf(spark, root, graft.sources.Versioned.latestVersion(root))
  .filter(col("n_tokens") === 4).count()
println(s"[skew] hot-fp survivors in corpus (must be 1): $hotSurvivors")
sys.exit(0)
