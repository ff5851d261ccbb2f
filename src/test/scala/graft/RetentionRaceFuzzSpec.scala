package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.streaming.Streams

/** Seeded fuzz of RETENTION (`Versioned.expire`) against the live
  * ingest protocol — the composition the round-14 maintenance specs
  * left open. DrainMaintRaceFuzzSpec races compact + vacuum (both
  * content-preserving and tag-preserving); DualDrainRaceFuzzSpec
  * proved per-stream txn identity; VersionedCrashFuzzSpec proved
  * expire's own kill points SOLO. The unproven story is expire
  * running in a system with a live (or crashed-and-resuming) writer:
  * retention deletes old manifests AND THE TXN TAGS INSIDE THEM —
  * the very evidence [[Versioned.lastTxnVersion]] uses to make a
  * restarted writer skip its already-committed batches.
  *
  * The deterministic first test is the production incident in
  * miniature: writer dies mid-batch AFTER its commit; while it is
  * down, a compaction loop minting UNTAGGED commits buries the
  * writer's newest tag and count-based retention expires it; the
  * writer restarts, finds no tag, and — pre-fix — RE-COMMITS its
  * already-committed batch, duplicating content in every later
  * snapshot. (Delta Lake is immune by construction: checkpoints
  * aggregate per-app txn versions, so retention never erases
  * idempotence evidence. The fix mirrors that: expire rolls the max
  * expired txnVersion per app into a `_txns` sidecar BEFORE
  * delisting — tags-forward-first extends expire's delist-first
  * crash ordering — and lastTxnVersion falls back to the sidecar
  * when no live manifest carries the app's tag.)
  *
  * The seeded schedules then race the full loop (compact + expire +
  * vacuum) against the drain with and without a mid-drain kill +
  * resume, asserting the DrainMaintRaceFuzzSpec invariants plus
  * no-duplicate-keys in every surviving snapshot.
  */
class RetentionRaceFuzzSpec extends SparkSpec {
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
                                nRows: Long,
                                storeFps: Set[String],
                                hw: Option[String])

  private def observe(root: String, scratch: String,
                      et: Boolean): DrainState = {
    val out =
      if (et) Streams.corpusWithLate(spark, root)
      else Streams.corpusAttribution(spark, root)
        .withColumn("status", lit("committed"))
    val rows = out.select("doc_id", "commit_v", "status")
      .as[(Long, Int, String)].collect()
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
    DrainState(rows.toSet, rows.length.toLong, fps, hw)
  }

  private def newBase(tag: String): String = {
    val base = java.nio.file.Files
      .createTempDirectory(s"graft-$tag").toString
    TempDirs.registerCleanedAtExit(base)
    base
  }

  private def assertNoDupKeys(root: String, ctx: String): Unit = {
    val latest = Versioned.latestVersion(root)
    val first = Versioned.oldestVersion(root)
    (first to latest).foreach { v =>
      val snap = Versioned.readAsOf(spark, root, v)
      val n = snap.count()
      val nd = snap.select("doc_id").distinct().count()
      assert(n == nd,
        s"$ctx v$v: DUPLICATE KEYS in snapshot ($n rows, $nd keys) " +
          "— a committed batch was re-committed")
    }
  }

  test("writer-down retention cascade: untagged compaction commits " +
      "bury the drain's newest txn tag, count-based expire deletes " +
      "it, and the resumed drain must still SKIP its committed batch") {
    // solo uninterrupted reference
    val refBase = newBase("retref")
    Streams.corpusIngestDrain(docs, s"$refBase/t", numBatches = 4,
      eventTime = None, compactEvery = 16,
      scratch = Some(s"$refBase/scratch"))
    val want = observe(s"$refBase/t", s"$refBase/scratch", et = false)

    val base = newBase("retcascade")
    val root = s"$base/t"
    val scratch = s"$base/scratch"
    // kill AFTER batch 1's commit is durable but before its
    // checkpoint completes: the resume WILL re-run batch 1, and only
    // the txn tag stands between the re-run and a duplicate commit
    Streams.corpusIngestDrain(docs, root, numBatches = 4,
      eventTime = None, compactEvery = 16, scratch = Some(scratch),
      crashAt = Some((1L, "post_commit")))
    // maintenance cascade while the writer is down: four untagged
    // compaction commits, then retention keeping only the last two —
    // every tagged manifest is now dead
    (1 to 4).foreach { _ =>
      val latest = Versioned.latestVersion(root)
      Versioned.compact(spark, root, "doc_id", latest, latest + 1,
        overwrite = false)
    }
    Versioned.expire(spark, root, keepVersions = 2)
    // writer restarts
    Streams.corpusIngestDrain(docs, root, numBatches = 4,
      eventTime = None, compactEvery = 16, scratch = Some(scratch))

    assertNoDupKeys(root, "cascade")
    val got = observe(root, scratch, et = false)
    assert(got.nRows == want.nRows,
      s"corpus row count diverged: ${got.nRows} vs solo " +
        s"${want.nRows} — the re-run batch re-committed")
    assert(got.rows == want.rows, "corpus attribution diverged")
    assert(got.storeFps == want.storeFps, "fp store diverged")
    assert(got.hw == want.hw, "high-water diverged")
  }

  test("expiry-floor guard: a commit whose version number retention " +
      "already freed is REJECTED as a conflict, not resurrected below " +
      "the tip (the round-15 fuzz catch: a slow writer whose attempt " +
      "out-lived the retention horizon renamed onto a freed name, " +
      "'won' silently, and its batch vanished from every tip read)") {
    val root = TempDirs.createCleanedAtExit("graft-retfloor") + "/t"
    def rows(tag: String) =
      (0 until 8).map(i => (i.toLong, tag)).toDF("k", "status")
    (1 to 5).foreach { v =>
      Versioned.write(rows(s"t$v"), root, "k", v, 1, overwrite = false)
    }
    Versioned.expire(spark, root, keepVersions = 2) // floor = 4
    // the slow writer's stale attempt: v=2 was expired, its name is
    // free — the rename WOULD succeed; the floor guard must reject
    intercept[Versioned.ConcurrentCommitException] {
      Versioned.write(rows("stale"), root, "k", 2, 1, overwrite = false)
    }
    // no resurrected version may exist, and the tip is untouched
    assert(!Versioned.hasVersion(root, 2), "freed version resurrected")
    assert(Versioned.latestVersion(root) == 5)
    assert(Versioned.oldestVersion(root) == 4)
    assert(Versioned.readAsOf(spark, root, 5)
      .select("status").as[String].collect().toSet == Set("t5"))
    // a fresh tip commit still lands normally
    Versioned.write(rows("t6"), root, "k", 6, 1, overwrite = false)
    assert(Versioned.latestVersion(root) == 6)
  }

  test("commitOnce exactly-once SURVIVES retention: expire rolls dead " +
      "txn tags into the _txns sidecar before delisting, so an " +
      "append-style writer whose tags died with old manifests still " +
      "skips its committed batch — and a crash between roll-forward " +
      "and delisting converges on re-run") {
    val root = TempDirs.createCleanedAtExit("graft-retcommit") + "/t"
    def rows(tag: String) =
      (0 until 8).map(i => (i.toLong, tag)).toDF("k", "status")
    // writer app-a commits txns 1 and 2 (each minting a version)
    Seq(1L, 2L).foreach { tv =>
      assert(Versioned.commitOnce(root, "app-a", tv) { parent =>
        Versioned.write(rows(s"t$tv"), root, "k", parent + 1, 1,
          overwrite = false, txn = Some(("app-a", tv)))
      })
    }
    // maintenance burst: four UNTAGGED commits bury app-a's tags,
    // then count-based retention expires every tagged manifest —
    // first with a crash straight after the roll-forward (the new
    // kill point), then the converging re-run
    (1 to 4).foreach { _ =>
      val l = Versioned.latestVersion(root)
      Versioned.write(rows("maint"), root, "k", l + 1, 1,
        overwrite = false)
    }
    intercept[RuntimeException] {
      Versioned.expire(spark, root, keepVersions = 2,
        crashAt = Some("post_txn_rollforward"))
    }
    Versioned.expire(spark, root, keepVersions = 2)
    // precondition: the hazard is ARMED — no live manifest carries
    // app-a's tag (checked on the filesystem, not via the API under
    // test)
    val liveTags = (Versioned.oldestVersion(root) to
        Versioned.latestVersion(root)).flatMap { v =>
      val f = new java.io.File(s"$root/_graft_manifest/v=$v", "_txn")
      if (f.exists()) Some(new String(java.nio.file.Files
        .readAllBytes(f.toPath), "UTF-8"))
      else None
    }
    assert(!liveTags.exists(_.contains("app-a")),
      "fixture defect: a live manifest still carries app-a's tag — " +
        "the retention hazard never armed")
    // the exactly-once contract must hold anyway: attempt NOT
    // re-invoked for a committed txn (pre-fix: re-invoked and
    // re-committed — duplicate delivery through the API itself)
    var called = false
    val did = Versioned.commitOnce(root, "app-a", 2L) { parent =>
      called = true
      Versioned.write(rows("dup"), root, "k", parent + 1, 1,
        overwrite = false, txn = Some(("app-a", 2L)))
    }
    assert(!did && !called,
      "retention erased txn evidence: the committed batch was " +
        "re-delivered")
    assert(Versioned.lastTxnVersion(root, "app-a").contains(2L),
      "sidecar floor lost")
    // a genuinely NEW txn still commits, and its LIVE tag now
    // dominates the sidecar floor
    assert(Versioned.commitOnce(root, "app-a", 3L) { parent =>
      Versioned.write(rows("t3"), root, "k", parent + 1, 1,
        overwrite = false, txn = Some(("app-a", 3L)))
    })
    assert(Versioned.lastTxnVersion(root, "app-a").contains(3L))

    // NEGATIVE CONTROL (the pre-fix behavior, kept as the permanent
    // regression proof): an identical fixture with the sidecar
    // renamed away has NO surviving evidence, and the API re-delivers
    // the committed batch — the sidecar is the load-bearing guard,
    // not some other mechanism
    val root2 = TempDirs.createCleanedAtExit("graft-retneg") + "/t"
    Seq(1L, 2L).foreach { tv =>
      Versioned.commitOnce(root2, "app-a", tv) { parent =>
        Versioned.write(rows(s"t$tv"), root2, "k", parent + 1, 1,
          overwrite = false, txn = Some(("app-a", tv)))
      }
    }
    (1 to 4).foreach { _ =>
      val l = Versioned.latestVersion(root2)
      Versioned.write(rows("maint"), root2, "k", l + 1, 1,
        overwrite = false)
    }
    Versioned.expire(spark, root2, keepVersions = 2)
    val sidecar = new java.io.File(s"$root2/_graft_manifest/_txns")
    assert(sidecar.isDirectory &&
      Option(sidecar.listFiles()).exists(_.nonEmpty),
      "expire wrote no sidecar")
    assert(sidecar.renameTo(
      new java.io.File(s"$root2/_graft_manifest/_txns_aside")))
    assert(Versioned.lastTxnVersion(root2, "app-a").isEmpty,
      "evidence survived outside the sidecar — control invalid")
    var ghost = false
    Versioned.commitOnce(root2, "app-a", 2L) { parent =>
      ghost = true
      Versioned.write(rows("ghost"), root2, "k", parent + 1, 1,
        overwrite = false, txn = Some(("app-a", 2L)))
    }
    assert(ghost, "without the sidecar the committed batch must " +
      "re-deliver (the documented pre-fix hazard) — if this starts " +
      "failing, some NEW evidence path exists and the sidecar " +
      "contract should be re-examined")
  }

  test("8 seeded schedules: drain (with and without mid-drain kill + " +
      "resume) races a compact + expire + vacuum maintenance loop — " +
      "drain states match solo, no snapshot ever holds duplicate " +
      "keys, retention actually expired versions") {
    val refs = scala.collection.mutable
      .Map[(Boolean, Int), DrainState]()
    def ref(et: Boolean, ce: Int): DrainState =
      refs.getOrElseUpdate((et, ce), {
        val b = newBase("retsolo")
        Streams.corpusIngestDrain(docs, s"$b/t", numBatches = 4,
          eventTime = if (et) Some(("ts", 100L)) else None,
          compactEvery = ce, scratch = Some(s"$b/scratch"))
        observe(s"$b/t", s"$b/scratch", et)
      })

    var expiredTotal = 0
    var cceTotal = 0
    (1 to FuzzScale.n(8, 2)).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729L)
      val et = rnd.nextBoolean()
      val ce = if (rnd.nextBoolean()) 2 else 16
      val crash: Option[(Long, String)] =
        if (seed % 2 == 0) Some((rnd.nextInt(3).toLong,
          Seq("pre_commit", "post_commit", "post_append")(
            rnd.nextInt(3))))
        else None
      val base = newBase(s"retrace$seed")
      val root = s"$base/t"
      val scratch = s"$base/scratch"
      val etOpt = if (et) Some(("ts", 100L)) else None

      val stop = new AtomicBoolean(false)
      val cce = new AtomicInteger(0)
      val expired = new AtomicInteger(0)
      val maintErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val jitterMs = 20 + rnd.nextInt(120)
      val keep = 2 + rnd.nextInt(2) // retention 2..3 versions
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
                // yieldToWriters: this loop models a production
                // maintenance daemon, and those DEFER to active
                // writers (round 15: a non-yielding loop at the
                // post-optimization maintenance speed starved the
                // drain's commitOnce for 80+ minutes — maintenance
                // minted versions faster than one merge attempt
                // completes, so every put-if-absent lost). The race
                // axis stays live: intents appear only AFTER a first
                // lost race, so every drain commit still races at
                // least one compaction, and crash schedules leave
                // stale intents that exercise the freshness expiry.
                Versioned.compact(spark, root, "doc_id", latest,
                  latest + 1, overwrite = false, yieldToWriters = true)
              } catch {
                case _: Versioned.ConcurrentCommitException =>
                  cce.incrementAndGet()
              }
              expired.addAndGet(math.min(1,
                Versioned.expire(spark, root, keepVersions = keep,
                  yieldToWriters = true)))
              // contended-host grace (see DrainMaintRaceFuzzSpec)
              Versioned.vacuumOrphans(spark, root, graceMs = 30000L)
            }
          }
        } catch { case t: Throwable => maintErr.set(t) }
      }, s"retention-maint-$seed")
      maint.start()
      try {
        crash.foreach { case (k, p) =>
          try Streams.corpusIngestDrain(docs, root, numBatches = 4,
            eventTime = etOpt, compactEvery = ce,
            scratch = Some(scratch), crashAt = Some((k, p)))
          catch {
            case e: RuntimeException
              if e.getMessage != null &&
                e.getMessage.startsWith("no versions") => ()
          }
        }
        Streams.corpusIngestDrain(docs, root, numBatches = 4,
          eventTime = etOpt, compactEvery = ce,
          scratch = Some(scratch))
      } finally {
        stop.set(true)
        maint.join(60000)
      }
      assert(maintErr.get() == null,
        s"seed $seed: maintenance thread failed: ${maintErr.get()}")
      cceTotal += cce.get(); expiredTotal += expired.get()

      assertNoDupKeys(root, s"seed $seed (et=$et ce=$ce keep=$keep " +
        s"crash=$crash)")
      val got = observe(root, scratch, et)
      val want = ref(et, ce)
      if (got.rows != want.rows) {
        System.err.println("==== POSTMORTEM seed " + seed + " ====")
        val manRoot = new java.io.File(s"$root/_graft_manifest")
        val allDirs = Option(manRoot.listFiles()).getOrElse(Array.empty)
          .filter(d => d.getName.startsWith("v=") ||
            d.getName.startsWith("_dead_v="))
          .sortBy(d => d.getName.replace("_dead_", "")
            .stripPrefix("v=").toInt)
        allDirs.foreach { d =>
          val tag = d.getName
          try {
            val rows = spark.read.parquet(d.getAbsolutePath).collect()
            System.err.println(s"[MAN] $tag " +
              rows.map(r => r.mkString(":").split("/").last).mkString(" | "))
          } catch { case e: Throwable =>
            System.err.println(s"[MAN] $tag UNREADABLE $e") }
          val txnF = new java.io.File(d, "_txn")
          if (txnF.exists())
            System.err.println(s"[TXN] $tag " + new String(
              java.nio.file.Files.readAllBytes(txnF.toPath), "UTF-8")
              .replace("\n", " / "))
        }
        val filesDir = new java.io.File(s"$root/files")
        val dataDirs = Option(filesDir.listFiles()).getOrElse(Array.empty)
        dataDirs.sortBy(_.getName).foreach { g =>
          try {
            val c = spark.read.parquet(g.getAbsolutePath)
              .select("doc_id", "commit_v")
              .collect().map(r => s"${r.getLong(0)}:v${r.get(1)}")
            System.err.println(s"[GRP] ${g.getName} n=${c.length} " +
              c.sorted.take(200).mkString(","))
          } catch { case e: Throwable =>
            System.err.println(s"[GRP] ${g.getName} UNREADABLE: $e") }
        }
        val sidecar = new java.io.File(s"$root/_graft_manifest/_txns")
        Option(sidecar.listFiles()).getOrElse(Array.empty).foreach { f =>
          System.err.println(s"[SIDE] ${f.getName} " + new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            .replace("\n", " / "))
        }
      }
      assert(got.nRows == want.nRows && got.rows == want.rows,
        s"seed $seed (et=$et ce=$ce keep=$keep crash=$crash): corpus " +
          s"diverged; missing=${(want.rows -- got.rows).take(5)} " +
          s"extra=${(got.rows -- want.rows).take(5)}")
      assert(got.storeFps == want.storeFps,
        s"seed $seed: fp store diverged")
      assert(got.hw == want.hw, s"seed $seed: high-water diverged")

      // the latest snapshot equals the corpus and survives a
      // zero-grace vacuum after all writers joined
      val latest = Versioned.latestVersion(root)
      val latestKeys = Versioned.readAsOf(spark, root, latest)
        .select("doc_id").as[Long].collect().toSet
      assert(latestKeys == want.rows.filter(_._3 == "committed")
        .map(_._1), s"seed $seed: latest snapshot keys diverged")
      Versioned.vacuumOrphans(spark, root, graceMs = 0L)
      val afterVac = Versioned.readAsOf(spark, root, latest)
        .select("doc_id").as[Long].collect().toSet
      assert(afterVac == latestKeys,
        s"seed $seed: zero-grace vacuum stranded the latest snapshot")
    }
    // liveness: retention must actually have expired versions across
    // the schedules, or the axis is dead
    assert(expiredTotal > 0,
      "expire never reclaimed a version — schedules are dead")
  }
}
