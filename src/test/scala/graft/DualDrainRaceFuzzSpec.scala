package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.streaming.Streams

/** Seeded CONCURRENCY fuzz of TWO independent ingest streams draining
  * into the SAME Versioned table (round-14: the multi-writer
  * composition DrainMaintRaceFuzzSpec left open — that spec races a
  * drain against content-PRESERVING maintenance; this one races two
  * content-PRODUCING writers, each with its own scratch/checkpoint,
  * the "two topics, one table" shape any multi-source lakehouse
  * ingest runs at 100 TB).
  *
  * What its first run caught (three real defects, fixed together):
  *  - txnApp was the CONSTANT "corpus-ingest": stream B's batch k was
  *    skipped as "already committed" the moment stream A committed
  *    ITS batch k — silent content loss through the idempotence
  *    machinery itself. txnApp is now per-stream (a UUID persisted in
  *    the stream's scratch, Delta's txnAppId-per-query contract).
  *  - the OCC retry loop re-read only the parent version, never the
  *    txn tag: a writer losing the put-if-absent to its own ZOMBIE
  *    TWIN (same app id, same batch — unfenced Spark drivers overlap
  *    on restart) would re-commit the batch it just lost to.
  *    [[Versioned.commitOnce]] now re-checks lastTxnVersion after
  *    every lost race.
  *  - the late-quarantine landed at `_quarantine_late/v=<k>` keyed by
  *    the DATA-derived batch label with overwrite mode — two streams
  *    both mint v=1,2,..., so the second stream's batch-k quarantine
  *    CLOBBERED the first's (content loss at the corpusWithLate
  *    reader). Now namespaced `app=<id>/v=<k>`; overwriting the
  *    stream's OWN cell remains the crash-resume idempotence rule.
  *
  * Invariants after EVERY schedule:
  *  - the dual-root corpus (doc_id, commit_v, status) is EXACTLY the
  *    union of the two solo runs' (slices are fp-disjoint by fixture
  *    construction, so cross-stream dedup cannot fire and the union
  *    is schedule-independent);
  *  - each stream's scratch-scoped states (fp store, high-water)
  *    match its solo run;
  *  - every surviving version reads with unique keys; the latest
  *    snapshot's keys are the committed union;
  *  - a zero-grace vacuum after both writers join strands nothing;
  *  - aliveness: across the schedules, the two apps' txn tags
  *    actually interleave in the version history at least once (the
  *    race axis was live, not sequential).
  */
class DualDrainRaceFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def prep(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("source"),
      graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"),
      round(graft.ops.TextAnalysis.qualityScoreOf(
        graft.ops.TextAnalysis.tokens(lower(col("text"))),
        col("text")), 6).as("q"),
      (col("doc_id") * 7L % 1000L).as("ts"))

  // two fp-DISJOINT slices: cross-stream dedup is per-stream by
  // design (the fp store is scratch-scoped), so a shared fingerprint
  // would make the final content depend on commit order — the
  // fixture removes that degree of freedom to keep the oracle exact
  private lazy val (docsA, docsB) = {
    val base = prep(Tables(spark, sf001, "documents").limit(240))
    val a = base.filter(col("doc_id") % 2 === 0).cache()
    val b0 = base.filter(col("doc_id") % 2 === 1)
    val b = b0.join(a.select("fp"), Seq("fp"), "left_anti").cache()
    a.count(); b.count()
    (a, b)
  }

  private case class DrainState(rows: Set[(Long, Int, String)],
                                storeFps: Set[String],
                                hw: Option[String])

  private def rowsOf(root: String, et: Boolean): Set[(Long, Int, String)] = {
    val out =
      if (et) Streams.corpusWithLate(spark, root)
      else Streams.corpusAttribution(spark, root)
        .withColumn("status", lit("committed"))
    out.select("doc_id", "commit_v", "status")
      .as[(Long, Int, String)].collect().toSet
  }

  private def scratchState(scratch: String): (Set[String], Option[String]) = {
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
    (fps, hw)
  }

  private def solo(docs: DataFrame, et: Boolean): DrainState = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-dualref").toString
    TempDirs.registerCleanedAtExit(base)
    Streams.corpusIngestDrain(docs, s"$base/t", numBatches = 4,
      eventTime = if (et) Some(("ts", 100L)) else None,
      compactEvery = 2, scratch = Some(s"$base/scratch"))
    val (fps, hw) = scratchState(s"$base/scratch")
    DrainState(rowsOf(s"$base/t", et), fps, hw)
  }

  private def txnAppsByVersion(root: String): Seq[String] = {
    (Versioned.oldestVersion(root) to Versioned.latestVersion(root))
      .flatMap { v =>
        val f = new java.io.File(
          s"$root/_graft_manifest/v=$v", "_txn")
        if (!f.exists()) None
        else new String(java.nio.file.Files.readAllBytes(f.toPath),
          "UTF-8").split("\n", 2).lift(1).map(_.trim)
      }
  }

  test("6 seeded schedules: two independent drains (own scratch, own " +
    "checkpoint) race into ONE table — content is the exact union of " +
    "the solo runs, per-stream states match solo, every version " +
    "unique-keyed, zero-grace vacuum safe, and the apps' commits " +
    "actually interleaved") {
    val refs = scala.collection.mutable.Map[(Char, Boolean), DrainState]()
    def ref(which: Char, et: Boolean): DrainState =
      refs.getOrElseUpdate((which, et),
        solo(if (which == 'A') docsA else docsB, et))

    var interleavings = 0
    (1 to FuzzScale.n(6, 2)).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729L)
      val et = rnd.nextBoolean()
      val staggerMs = rnd.nextInt(150)
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-dualdrain$seed").toString
      TempDirs.registerCleanedAtExit(base)
      val root = s"$base/t"
      val etOpt = if (et) Some(("ts", 100L)) else None

      val errA = new AtomicReference[Throwable]()
      val tA = new Thread(() => {
        try Streams.corpusIngestDrain(docsA, root, numBatches = 4,
          eventTime = etOpt, compactEvery = 2,
          scratch = Some(s"$base/sA"))
        catch { case t: Throwable => errA.set(t) }
      }, s"drainA-$seed")
      tA.start()
      Thread.sleep(staggerMs.toLong)
      // drain B runs on the test thread — same session, own scratch
      Streams.corpusIngestDrain(docsB, root, numBatches = 4,
        eventTime = etOpt, compactEvery = 2,
        scratch = Some(s"$base/sB"))
      tA.join(120000)
      assert(!tA.isAlive, s"seed $seed: drain A did not terminate")
      assert(errA.get() == null,
        s"seed $seed: drain A failed: ${errA.get()}")

      // content is the exact union of the solo runs (diff-based
      // compare so a failure reports the divergence, not megabytes
      // of both sets)
      val got = rowsOf(root, et)
      val want = ref('A', et).rows ++ ref('B', et).rows
      val missing = want -- got
      val extra = got -- want
      assert(missing.isEmpty && extra.isEmpty,
        s"seed $seed (et=$et stagger=${staggerMs}ms): corpus diverged " +
          s"from the solo union; missing ${missing.size} " +
          s"(${missing.take(5)}) extra ${extra.size} " +
          s"(${extra.take(5)})")

      // per-stream scratch states match solo
      val (fpsA, hwA) = scratchState(s"$base/sA")
      val (fpsB, hwB) = scratchState(s"$base/sB")
      assert(fpsA == ref('A', et).storeFps,
        s"seed $seed: stream A fp store diverged")
      assert(fpsB == ref('B', et).storeFps,
        s"seed $seed: stream B fp store diverged")
      assert(hwA == ref('A', et).hw, s"seed $seed: stream A high-water")
      assert(hwB == ref('B', et).hw, s"seed $seed: stream B high-water")

      // every surviving version unique-keyed; latest = committed union
      val latest = Versioned.latestVersion(root)
      (Versioned.oldestVersion(root) to latest).foreach { v =>
        val snap = Versioned.readAsOf(spark, root, v)
        val n = snap.count()
        val nd = snap.select("doc_id").distinct().count()
        assert(n == nd, s"seed $seed v$v: duplicate keys ($n vs $nd)")
      }
      val latestKeys = Versioned.readAsOf(spark, root, latest)
        .select("doc_id").as[Long].collect().toSet
      assert(latestKeys ==
        want.filter(_._3 == "committed").map(_._1),
        s"seed $seed: latest snapshot keys diverged from the union")

      // zero-grace vacuum after both writers joined strands nothing
      Versioned.vacuumOrphans(spark, root, graceMs = 0L)
      val afterVac = Versioned.readAsOf(spark, root, latest)
        .select("doc_id").as[Long].collect().toSet
      assert(afterVac == latestKeys,
        s"seed $seed: zero-grace vacuum stranded the latest snapshot")

      // aliveness bookkeeping: did the two apps' commits interleave?
      val apps = txnAppsByVersion(root)
      val changes = apps.sliding(2).count {
        case Seq(x, y) => x != y
        case _         => false
      }
      if (changes >= 2) interleavings += 1

      // the concurrent restore of the shuffle-partitions conf can
      // leak the drain's setting when two drains overlap (benign for
      // content — every drain op is partitioning-invariant); reset so
      // later suites see the session default
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    assert(interleavings >= 1,
      "the two drains never interleaved commits in any schedule — " +
        "the race axis is dead (stagger too coarse?)")
  }
}
