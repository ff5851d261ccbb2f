package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.streaming.Streams

/** Seeded CONCURRENCY fuzz of the ingest drain × lakehouse
  * maintenance (round-14: the CommitRaceFuzzSpec × DrainCrashFuzzSpec
  * composition). The drain's crash points are proven solo
  * (DrainCrashFuzzSpec) and the OCC commit races are proven on
  * Versioned alone (CommitRaceFuzzSpec); the unproven composition was
  * a drain MID-BATCH while another session runs maintenance on the
  * same table root — `compact` (content-preserving: the drain's merge
  * path writes no tombstones, so compaction is a manifest-only
  * re-commit) at `overwrite = false`, plus `vacuumOrphans` under a
  * grace window exceeding any write-group-to-manifest gap (the
  * documented contract that makes vacuum safe under in-flight
  * writers).
  *
  * The version algebra under race (the protocol this spec's first
  * run forced): BOTH sessions mint `latest + 1` with
  * `overwrite = false` — the drain's idempotence comes from the
  * txnAppId/txnVersion tag (re-runs of a committed batch SKIP, they
  * never rewrite history), and a lost put-if-absent re-reads the
  * parent and retries via [[Versioned.commitOnce]]. The OLD protocol
  * (data-derived deterministic versions, `overwrite = true`) was
  * crash-resume-idempotent solo but lost ALL content under this very
  * schedule: maintenance no-op compactions cascaded ahead of the
  * drain's overwrites, leaving `latest` serving batch-0 forever
  * (caught by this spec's first run, seed 1, no kill needed). Half
  * the schedules add a mid-drain KILL + resume so the re-run's
  * txn-skip path also races maintenance.
  *
  * Scope note: the fp STORE (scratch/store) is checkpoint-scoped
  * single-writer by contract — the streaming checkpoint admits one
  * drain per scratch, and the store compaction runs inside the batch
  * — so cross-session STORE compaction is out of contract; the shared
  * mutable surface under race is the Versioned root.
  *
  * Invariants after EVERY schedule:
  *  - the four drain-visible states (committed corpus + attribution,
  *    quarantine statuses, fp-store key set, high-water record) are
  *    IDENTICAL to a solo uninterrupted drain's;
  *  - every surviving version reads with unique keys, and the LATEST
  *    version's content equals the drain's final corpus (maintenance
  *    is content-preserving);
  *  - a final zero-grace vacuum strands nothing: the latest snapshot
  *    still reads identically after it.
  */
class DrainMaintRaceFuzzSpec extends SparkSpec {
  import spark.implicits._

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

  test("8 seeded schedules: drain (with and without mid-drain kill + " +
    "resume) races a concurrent compact + vacuum maintenance loop — " +
    "all four drain states match the solo run, every version stays " +
    "readable, zero-grace vacuum strands nothing") {
    // solo references, one per (et, compactEvery) config actually
    // drawn by the schedules below
    val refs = scala.collection.mutable
      .Map[(Boolean, Int), DrainState]()
    def ref(et: Boolean, ce: Int): DrainState =
      refs.getOrElseUpdate((et, ce), {
        val base = java.nio.file.Files
          .createTempDirectory("graft-maintref").toString
        TempDirs.registerCleanedAtExit(base)
        Streams.corpusIngestDrain(docs, s"$base/t", numBatches = 4,
          eventTime = if (et) Some(("ts", 100L)) else None,
          compactEvery = ce, scratch = Some(s"$base/scratch"))
        observe(s"$base/t", s"$base/scratch", et)
      })

    var cceTotal = 0
    var maintCommits = 0
    (1 to FuzzScale.n(8, 2)).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919L)
      val et = rnd.nextBoolean()
      val ce = if (rnd.nextBoolean()) 2 else 16
      val crash: Option[(Long, String)] =
        if (seed % 2 == 0) Some((rnd.nextInt(3).toLong,
          Seq("pre_commit", "post_commit", "post_append")(
            rnd.nextInt(3))))
        else None
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-maintrace$seed").toString
      TempDirs.registerCleanedAtExit(base)
      val root = s"$base/t"
      val scratch = s"$base/scratch"
      val etOpt = if (et) Some(("ts", 100L)) else None

      val stop = new AtomicBoolean(false)
      val cce = new AtomicInteger(0)
      val commits = new AtomicInteger(0)
      val maintErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val jitterMs = 20 + rnd.nextInt(120)
      val maint = new Thread(() => {
        try {
          while (!stop.get()) {
            Thread.sleep(jitterMs.toLong)
            val latest =
              try Versioned.latestVersion(root) catch {
                case _: Throwable => 0
              }
            if (latest >= 1) {
              try {
                // yieldToWriters: production maintenance defers to
                // active writers (see RetentionRaceFuzzSpec's note on
                // the round-15 starvation this closes)
                Versioned.compact(spark, root, "doc_id", latest,
                  latest + 1, overwrite = false, yieldToWriters = true)
                commits.incrementAndGet()
              } catch {
                case _: Versioned.ConcurrentCommitException =>
                  cce.incrementAndGet()
              }
              // in-race vacuum under the documented grace contract.
              // 30 s, not the fixture's typical sub-second gap: on a
              // CONTENDED host (three JVMs on one box — observed when
              // this suite ran beside a 16-thread fuzz campaign) a
              // drain's group-write→commit window stretched past the
              // old 5 s grace and vacuum correctly-per-contract
              // deleted the in-flight group — the exact timing hazard
              // the grace parameter exists to bound. The production
              // default is 20 min for the same reason; the test value
              // only needs to beat the fixture's worst contended gap.
              Versioned.vacuumOrphans(spark, root, graceMs = 30000L)
            }
          }
        } catch { case t: Throwable => maintErr.set(t) }
      }, s"maint-$seed")
      maint.start()
      try {
        crash.foreach { case (k, p) =>
          // the crash run's trailing attribution read can find ZERO
          // committed versions when the kill lands in batch 0 before
          // the first commit — that read is the drain's RETURN value,
          // not a side effect, so tolerate it on the killed leg only
          try Streams.corpusIngestDrain(docs, root, numBatches = 4,
            eventTime = etOpt, compactEvery = ce,
            scratch = Some(scratch), crashAt = Some((k, p)))
          catch {
            case e: RuntimeException
              if e.getMessage != null &&
                e.getMessage.startsWith("no versions") => ()
          }
        }
        // resume (or sole uninterrupted run) WHILE maintenance races
        Streams.corpusIngestDrain(docs, root, numBatches = 4,
          eventTime = etOpt, compactEvery = ce,
          scratch = Some(scratch))
      } finally {
        stop.set(true)
        maint.join(60000)
      }
      assert(maintErr.get() == null,
        s"seed $seed: maintenance thread failed: ${maintErr.get()}")
      cceTotal += cce.get(); maintCommits += commits.get()

      // the four drain-visible states match the solo run exactly
      val got = observe(root, scratch, et)
      val want = ref(et, ce)
      assert(got.rows == want.rows,
        s"seed $seed (et=$et ce=$ce crash=$crash): corpus diverged; " +
          s"missing=${(want.rows -- got.rows).take(5)} " +
          s"extra=${(got.rows -- want.rows).take(5)}")
      assert(got.storeFps == want.storeFps,
        s"seed $seed: fp store diverged")
      assert(got.hw == want.hw, s"seed $seed: high-water diverged: " +
        s"${got.hw} vs ${want.hw}")

      // every surviving version reads with unique keys; the latest
      // content equals the drain's corpus (maintenance commits are
      // content-preserving)
      val latest = Versioned.latestVersion(root)
      (1 to latest).foreach { v =>
        val snap = Versioned.readAsOf(spark, root, v)
        val n = snap.count()
        val nd = snap.select("doc_id").distinct().count()
        assert(n == nd, s"seed $seed v$v: duplicate keys ($n vs $nd)")
      }
      val latestKeys = Versioned.readAsOf(spark, root, latest)
        .select("doc_id").as[Long].collect().toSet
      assert(latestKeys == want.rows.filter(_._3 == "committed")
        .map(_._1),
        s"seed $seed: latest snapshot keys diverged from corpus")

      // zero-grace vacuum after all writers joined: nothing referenced
      // is reclaimed — the latest snapshot still reads identically
      Versioned.vacuumOrphans(spark, root, graceMs = 0L)
      val afterVac = Versioned.readAsOf(spark, root, latest)
        .select("doc_id").as[Long].collect().toSet
      assert(afterVac == latestKeys,
        s"seed $seed: zero-grace vacuum stranded the latest snapshot")
    }
    // the race axes were LIVE: maintenance must have committed or
    // lost at least once across the 8 schedules
    assert(maintCommits + cceTotal > 0,
      "maintenance never raced the drain — schedules are dead")
  }
}
