package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Seeded crash-point fuzz for the ingest drain (the CommitRaceFuzz
  * move applied to st16/st17): the original crash-resume proof killed
  * the drain at ONE point (post-batch, pre-checkpoint), but a batch
  * has FIVE distinct side effects — compaction rename, quarantine
  * write, Versioned commit, fp-store append, high-water record — and
  * a kill between ANY adjacent pair must resume from the checkpoint
  * to a state indistinguishable from the uninterrupted run.
  *
  * Each seeded schedule draws (kill batch, kill point ∈ pre_commit /
  * post_commit / post_append / post_batch, event-time on or off,
  * compactEvery ∈ {2, 16} — 2 forces mid-drain compactions so kills
  * land with a compaction pending), runs the drain to the kill,
  * resumes with the same scratch, and asserts ALL FOUR externally
  * visible states hash-identical to an uninterrupted run of the same
  * configuration: the committed corpus (with attribution), the
  * quarantine (via the `late` status rows), the fp store's key set,
  * and the high-water record.
  */
class DrainCrashFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val points =
    Seq("pre_commit", "post_commit", "post_append", "post_batch")

  private lazy val docs = Tables(spark, sf001, "documents").limit(120)
    .select(col("doc_id"), col("source"),
      graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"),
      round(graft.ops.TextAnalysis.qualityScoreOf(
        graft.ops.TextAnalysis.tokens(lower(col("text"))),
        col("text")), 6).as("q"),
      (col("doc_id") * 7L % 1000L).as("ts"))
    .cache()

  private case class DrainState(rows: Set[(Long, Int, String)],
                                storeFps: Set[String],
                                hw: Option[String])

  private def observe(root: String, scratch: String,
                      et: Boolean): DrainState = {
    val out =
      if (et) Streams.corpusWithLate(spark, root)
      else Streams.corpusAttribution(spark, root)
        .withColumn("status", lit("committed"))
    val rows = out.select("doc_id", "commit_v", "status")
      .as[(Long, Int, String)].collect().toSet
    val storeDirs = Option(
        new java.io.File(s"$scratch/store").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".d"))
      .map(_.getAbsolutePath)
    val fps =
      if (storeDirs.isEmpty) Set.empty[String]
      else spark.read.parquet(storeDirs.toSeq: _*)
        .select("fp").as[String].collect().toSet
    val hwF = new java.io.File(s"$scratch/store/hw.v")
    val hw = if (hwF.exists()) Some(new String(
      java.nio.file.Files.readAllBytes(hwF.toPath), "UTF-8").trim)
      else None
    DrainState(rows, fps, hw)
  }

  private def run(et: Boolean, compactEvery: Int,
                  crash: Option[(Long, String)]): DrainState = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-crashfuzz").toString
    TempDirs.registerCleanedAtExit(base)
    val root = s"$base/t"
    val scratch = s"$base/scratch"
    val etOpt = if (et) Some(("ts", 100L)) else None
    crash match {
      case Some((k, "post_batch")) =>
        Streams.corpusIngestDrain(docs, root, numBatches = 4,
          eventTime = etOpt, compactEvery = compactEvery,
          scratch = Some(scratch), crashAfterBatch = Some(k))
      case Some((k, p)) =>
        Streams.corpusIngestDrain(docs, root, numBatches = 4,
          eventTime = etOpt, compactEvery = compactEvery,
          scratch = Some(scratch), crashAt = Some((k, p)))
      case None => ()
    }
    // resume (or first run, uninterrupted) from the same checkpoint
    Streams.corpusIngestDrain(docs, root, numBatches = 4,
      eventTime = etOpt, compactEvery = compactEvery,
      scratch = Some(scratch))
    observe(root, scratch, et)
  }

  test("8 seeded kill schedules x {corpus, quarantine, fp store, " +
    "high-water}: resume from any of the drain's 4 kill points " +
    "converges to the uninterrupted state") {
    // uninterrupted references, one per (et, compactEvery) config
    val refs = scala.collection.mutable
      .Map[(Boolean, Int), DrainState]()
    def ref(et: Boolean, ce: Int): DrainState =
      refs.getOrElseUpdate((et, ce), run(et, ce, None))

    (1 to FuzzScale.n(8, 3)).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919L)
      val k = rnd.nextInt(3).toLong // kill batch 0..2 of 4
      // round-robin over the kill points (each exercised exactly
      // twice across the 8 schedules); batch, event-time, and
      // compaction regime are the seeded axes
      val point = points((seed - 1) % points.size)
      val et = rnd.nextBoolean()
      val ce = if (rnd.nextBoolean()) 2 else 16
      val expect = ref(et, ce)
      assert(expect.rows.nonEmpty)
      val got = run(et, ce, Some((k, point)))
      val tag = s"seed $seed (kill $point@b$k et=$et compact=$ce)"
      assert(got.rows == expect.rows,
        s"$tag corpus diverged: got-only ${
          (got.rows -- expect.rows).take(5)} expect-only ${
          (expect.rows -- got.rows).take(5)}")
      assert(got.storeFps == expect.storeFps,
        s"$tag fp store diverged: got-only ${
          (got.storeFps -- expect.storeFps).take(5)} expect-only ${
          (expect.storeFps -- got.storeFps).take(5)}")
      assert(got.hw == expect.hw,
        s"$tag high-water diverged: got=${got.hw} " +
          s"expect=${expect.hw}")
    }
  }

  test("live kills INSIDE the compaction block (between temp write " +
    "and rename; between rename and delete-olds) resume to the " +
    "uninterrupted state — stale _ctmp cleared, duplicate fps " +
    "collapsed") {
    // compactEvery = 2 with 4 batches deterministically fires the
    // compaction at batch 3 (store holds b0/b1/b2.d = 3 > 2), so the
    // kill lands with the compaction genuinely in flight — the LIVE
    // version of the planted-residue test in DrainScaleSpec
    for (point <- Seq("mid_compact_pre_rename", "post_compact_rename");
         et <- Seq(false, true)) {
      val expect = run(et, 2, None)
      assert(expect.rows.nonEmpty)
      val got = run(et, 2, Some((3L, point)))
      val tag = s"kill $point@b3 et=$et"
      assert(got.rows == expect.rows,
        s"$tag corpus diverged: got-only ${
          (got.rows -- expect.rows).take(5)} expect-only ${
          (expect.rows -- got.rows).take(5)}")
      assert(got.storeFps == expect.storeFps,
        s"$tag fp store diverged")
      assert(got.hw == expect.hw,
        s"$tag high-water diverged: got=${got.hw} expect=${expect.hw}")
    }
  }
}
