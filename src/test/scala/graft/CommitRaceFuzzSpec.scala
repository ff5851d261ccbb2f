package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Seeded CONCURRENCY fuzz of the lakehouse commit protocol
  * (round-12): ChangeFeedFuzzSpec fuzzes commit HISTORIES; this spec
  * fuzzes commit INTERLEAVINGS. Per seeded schedule, three writer
  * threads race {COW merge, evolve-merge, MOR tombstone, compact,
  * restore} against a concurrent `vacuumOrphans` maintenance loop and
  * a snapshot/change-feed reader, all on one SparkSession. Losers of
  * the optimistic commit surface as [[Versioned.ConcurrentCommitException]]
  * and retry at a fresh version — exactly the production protocol.
  *
  * Invariants gated after EVERY schedule, whatever interleaving won:
  *  - exactly ONE winner per version, and versions are contiguous
  *    (a success is the only thing that can mint a version);
  *  - every committed version stays readable with unique keys, both
  *    DURING the race (reader thread) and after a final zero-grace
  *    vacuum (orphan reclamation never strands a referenced file
  *    group — the abandoned file groups of losing writers are the
  *    orphans by construction);
  *  - the change feed equals the manifest-free brute-force snapshot
  *    diff at every adjacent pair;
  *  - per-commit feed key uniqueness.
  *
  * The in-race vacuum runs under a grace window that exceeds any
  * write-group-to-manifest-commit gap (the documented contract that
  * makes vacuum safe under in-flight writers); the zero-grace vacuum
  * runs only after every thread has joined.
  */
class CommitRaceFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Writers = 3
  private val OpsPerWriter = 3

  test("commit protocol under true concurrency: 8 seeded schedules " +
    "of racing merge/evolve/tombstone/compact/restore writers + " +
    "vacuum + readers keep every invariant (one winner per version, " +
    "all versions readable, CDF = brute-force diff, no stranded " +
    "files)") {
    var cceTotal = 0
    (1 to FuzzScale.n(8, 3)).foreach { seed =>
      val root =
        TempDirs.createCleanedAtExit(s"graft-race-fuzz$seed") + "/t"
      Versioned.write(
        (0 until 24).map(i => (i.toLong, s"s$i")).toDF("k", "status"),
        root, "k", version = 1, nFiles = 2)

      val wins = new ConcurrentLinkedQueue[(Int, String)]()
      val errors = new ConcurrentLinkedQueue[String]()
      val cces = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var writersDone = false

      def writer(wid: Int): Thread = new Thread(() => {
        val rnd = new scala.util.Random(seed * 1000 + wid)
        var done = 0
        var attempts = 0
        while (done < OpsPerWriter && attempts < OpsPerWriter * 40) {
          attempts += 1
          try {
            val v = Versioned.latestVersion(root)
            val op = rnd.nextInt(5)
            op match {
              case 0 | 1 =>
                val live = Versioned.readAsOf(spark, root, v)
                  .select("k").as[Long].collect().toSet
                val upd = live.filter(_ => rnd.nextBoolean()).take(4)
                  .toSeq.sorted
                val ins = Seq(10000L + wid * 1000L + done * 10L +
                  rnd.nextInt(5))
                val rows =
                  upd.map(k => (k, s"w$wid-$done-$k", "U")) ++
                    ins.map(k => (k, s"n$wid-$done", "U"))
                val base = rows.toDF("k", "status", "op")
                val changes =
                  if (op == 1)
                    base.withColumn("tier",
                      when(col("op") === "U",
                        concat(lit("t"), col("k"))))
                  else base
                Versioned.merge(spark, root, "k", "op", changes,
                  v, v + 1, overwrite = false)
                wins.add((v + 1, s"w$wid:merge"))
                done += 1
              case 2 =>
                val live = Versioned.readAsOf(spark, root, v)
                  .select("k").as[Long].collect().toSet
                val del = live.filter(_ => rnd.nextInt(5) == 0)
                  .take(3).toSeq.sorted
                if (del.nonEmpty) {
                  Versioned.deleteMor(spark, root, "k",
                    del.toDF("k"), v, v + 1, overwrite = false)
                  wins.add((v + 1, s"w$wid:tomb"))
                  done += 1
                }
              case 3 =>
                Versioned.compact(spark, root, "k", v, v + 1,
                  overwrite = false)
                wins.add((v + 1, s"w$wid:compact"))
                done += 1
              case _ =>
                val to = 1 + rnd.nextInt(math.max(1, v))
                val newV = Versioned.restore(spark, root, to)
                wins.add((newV, s"w$wid:restore($to)"))
                done += 1
            }
          } catch {
            case _: Versioned.ConcurrentCommitException =>
              cces.incrementAndGet() // lost the race; retry fresh
            case _: IllegalArgumentException =>
              () // merge over a tombstoned base; retry another op
            case t: Throwable =>
              errors.add(s"w$wid: ${t.getClass.getSimpleName}: " +
                s"${t.getMessage}")
              done = OpsPerWriter // abort this writer
          }
        }
      })

      val vacuumer = new Thread(() => {
        val rnd = new scala.util.Random(seed * 7777)
        while (!writersDone) {
          try {
            // grace >> any write-group-to-commit gap: safe with
            // writers in flight (the documented vacuum contract)
            Versioned.vacuumOrphans(spark, root, graceMs = 60000L)
          } catch {
            case t: Throwable =>
              errors.add(s"vacuum: ${t.getMessage}")
          }
          Thread.sleep(20 + rnd.nextInt(60))
        }
      })

      val reader = new Thread(() => {
        val rnd = new scala.util.Random(seed * 31337)
        while (!writersDone) {
          try {
            val latest = Versioned.latestVersion(root)
            assert(Versioned.readAsOf(spark, root, latest)
              .count() >= 0)
            if (latest >= 2) {
              val v = 2 + rnd.nextInt(latest - 1)
              Versioned.changeFeed(spark, root, "k", v - 1, v).count()
            }
          } catch {
            case t: Throwable =>
              errors.add(s"reader: ${t.getClass.getSimpleName}: " +
                s"${t.getMessage}")
          }
          Thread.sleep(10 + rnd.nextInt(40))
        }
      })

      val ws = (0 until Writers).map(writer)
      vacuumer.start(); reader.start(); ws.foreach(_.start())
      ws.foreach(_.join(180000))
      // a straggler still alive past the join timeout races the
      // zero-grace vacuumOrphans (documented safe only after every
      // writer is dead) and would misreport as a protocol violation.
      // Record it BEFORE releasing the vacuumer (so the loops still
      // terminate and the JVM can exit), then fail with the clear
      // schedule-timeout message ahead of any invariant assert.
      val stragglers = ws.zipWithIndex.collect {
        case (t, i) if t.isAlive => i
      }
      writersDone = true
      vacuumer.join(30000); reader.join(30000)
      assert(stragglers.isEmpty,
        s"seed $seed: writers $stragglers still running after the " +
          "180s join — schedule timed out, not a protocol violation")
      assert(!vacuumer.isAlive && !reader.isAlive,
        s"seed $seed: vacuumer/reader still running after join — " +
          "schedule timed out")

      assert(errors.isEmpty, s"seed $seed: ${errors.toArray.toSeq}")

      // one winner per version, contiguous: every success minted a
      // unique version and nothing else can
      val committed = {
        val it = wins.iterator()
        val b = scala.collection.mutable.ArrayBuffer[(Int, String)]()
        while (it.hasNext) b += it.next()
        b.toSeq
      }
      val latest = Versioned.latestVersion(root)
      assert(committed.map(_._1).distinct.size == committed.size,
        s"seed $seed: two winners for one version: " +
          committed.groupBy(_._1).filter(_._2.size > 1))
      assert(committed.map(_._1).toSet == (2 to latest).toSet,
        s"seed $seed: version gap: ${committed.sortBy(_._1)}")

      // zero-grace vacuum AFTER all threads joined: losing writers'
      // abandoned file groups are reclaimed; no referenced group may
      // be touched
      Versioned.vacuumOrphans(spark, root, graceMs = 0L)

      (1 to latest).foreach { v =>
        val snap = Versioned.readAsOf(spark, root, v)
        val n = snap.count()
        val nk = snap.select("k").distinct().count()
        assert(n == nk, s"seed $seed v$v: duplicate keys after race")
      }
      (2 to latest).foreach { v =>
        val got = CdfTestUtil.feedOf(spark, root, v)
        val want = CdfTestUtil.bruteDiff(spark, root, v)
        assert(got == want, s"seed $seed v$v (${committed.find(_._1 == v)}): " +
          s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      }
      val full = Versioned.changeFeed(spark, root, "k", 1, latest)
      val dup = full.groupBy("_commit_version", "_change_type", "k")
        .count().filter(col("count") > 1).count()
      assert(dup == 0, s"seed $seed: duplicate feed rows")
      cceTotal += cces.get()
    }
    // the race axis must be LIVE: across 8 schedules of 3 writers
    // targeting the same next version, someone must have lost
    assert(cceTotal >= 1, "no optimistic-commit conflict ever fired " +
      "— the schedules never actually raced")
  }

  test("commitOnce: losing the put-if-absent to a ZOMBIE TWIN (same " +
    "app, same txnVersion) SKIPS instead of re-committing; losing to " +
    "an unrelated writer retries and commits exactly once; an " +
    "already-committed txn short-circuits without calling attempt") {
    val root = TempDirs.createCleanedAtExit("graft-commitonce") + "/t"
    def rows(tag: String) =
      (0 until 8).map(i => (i.toLong, tag)).toDF("k", "status")
    Versioned.write(rows("base"), root, "k", version = 1, nFiles = 1)

    // twin scenario, deterministically interleaved: the twin's commit
    // of the SAME (app, txn) lands between our parent read and our
    // rename — simulated by committing it inside the attempt callback
    var attempts = 0
    val didCommit = Versioned.commitOnce(root, "app-x", 7L) { parent =>
      attempts += 1
      Versioned.write(rows("twin"), root, "k", parent + 1, 1,
        overwrite = false, txn = Some(("app-x", 7L)))
      // our own commit at the same version now loses the race
      Versioned.write(rows("ours"), root, "k", parent + 1, 1,
        overwrite = false, txn = Some(("app-x", 7L)))
    }
    assert(!didCommit, "the twin committed txn 7 — we must report " +
      "skip, not a commit")
    assert(attempts == 1, s"retried after the twin's commit " +
      s"($attempts attempts) — duplicate delivery")
    assert(Versioned.latestVersion(root) == 2,
      "exactly one version minted for txn 7")
    assert(Versioned.lastTxnVersion(root, "app-x").contains(7L))

    // unrelated-winner scenario: first attempt loses to app-y; the
    // retry must commit (txn 8 is NOT committed by anyone else)
    var tries = 0
    val did2 = Versioned.commitOnce(root, "app-x", 8L) { parent =>
      tries += 1
      if (tries == 1)
        Versioned.write(rows("other"), root, "k", parent + 1, 1,
          overwrite = false, txn = Some(("app-y", 99L)))
      Versioned.write(rows("mine8"), root, "k", parent + 1, 1,
        overwrite = false, txn = Some(("app-x", 8L)))
    }
    assert(did2, "txn 8 was never committed elsewhere — the retry " +
      "must commit it")
    assert(tries == 2, s"expected one lost race + one retry, got $tries")
    assert(Versioned.lastTxnVersion(root, "app-x").contains(8L))
    assert(Versioned.lastTxnVersion(root, "app-y").contains(99L))

    // already-committed short-circuit: attempt must not run at all
    var called = false
    val did3 = Versioned.commitOnce(root, "app-x", 7L) { _ =>
      called = true
    }
    assert(!did3 && !called,
      "txn 7 is committed — attempt must not be invoked")
  }
}
