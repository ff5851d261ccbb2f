package graft

import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Maintenance-op CRASH atomicity fuzz (round 14): the drain's crash
  * points are proven (DrainCrashFuzzSpec), the OCC races are proven
  * (CommitRaceFuzzSpec) — the open story was the MAINTENANCE ops'
  * own kill points. merge/compact/restore are structurally atomic
  * (every file write precedes the single manifest rename), but
  * `expire` and `writeWithExpectations` are multi-step filesystem
  * sequences with NO commit point, so their intermediate states are
  * externally visible after a crash.
  *
  * The invariants a crash may never break:
  *  - a LISTED version is a READABLE version with its exact pre-op
  *    content — crash debris may only be ORPHANS (files no manifest
  *    references), never a manifest referencing deleted files;
  *  - a COMMITTED expectations version implies its quarantine audit
  *    record exists — violators must never vanish from both sides;
  *  - re-running the interrupted op converges to the uninterrupted
  *    twin's state, and zero-grace vacuum reclaims all debris without
  *    touching anything live;
  *  - `restore` targeting any listed survivor round-trips its content
  *    (the pre-fix expire order made restore-to-a-half-expired-version
  *    commit a manifest referencing DELETED files — a permanently
  *    broken latest snapshot).
  */
class VersionedCrashFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val base = java.nio.file.Files
      .createTempDirectory(s"graft-vcrash-$tag").toString
    TempDirs.registerCleanedAtExit(base)
    s"$base/t"
  }

  /** Deterministic random history (writes, COW merges, MOR deletes,
    * compactions) — identical on any root for the same seed; set
    * iteration never leaks into op choice (keys sorted first).
    */
  private def buildHistory(root: String, seed: Int): Int = {
    val rnd = new scala.util.Random(seed)
    val n = 30
    Versioned.write((0 until n).map(i => (i.toLong, s"s$i", i * 2.0))
      .toDF("k", "status", "price"), root, "k", version = 1,
      nFiles = 1 + rnd.nextInt(4))
    var v = 1
    var tombstoned = false
    while (v < 6) {
      val live = Versioned.readAsOf(spark, root, v)
        .select("k").as[Long].collect().toSet
      val op = rnd.nextInt(3)
      if (op == 0 && !tombstoned) {
        val upd = live.toSeq.sorted.filter(_ => rnd.nextBoolean()).take(5)
        val del = (live -- upd).toSeq.sorted
          .filter(_ => rnd.nextInt(4) == 0).take(3)
        val rows = upd.map(k => (k, s"u$v-$k", k * 3.0 + v, "U")) ++
          del.map(k => (k, "x", 0.0, "D"))
        if (rows.nonEmpty) {
          Versioned.merge(spark, root, "k", "op",
            rows.toDF("k", "status", "price", "op"), v, v + 1)
          v += 1
        }
      } else if (op == 1) {
        val keys = live.toSeq.sorted
          .filter(_ => rnd.nextInt(5) == 0).take(4)
        if (keys.nonEmpty) {
          Versioned.deleteMor(spark, root, "k", keys.toDF("k"), v, v + 1)
          v += 1; tombstoned = true
        }
      } else {
        Versioned.compact(spark, root, "k", v, v + 1)
        v += 1; tombstoned = false
      }
    }
    v
  }

  private def content(root: String, v: Int): Seq[(Long, String, Double)] =
    Versioned.readAsOf(spark, root, v).select("k", "status", "price")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq

  private def listed(root: String): Seq[Int] =
    Option(new java.io.File(s"$root/_graft_manifest").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toInt).sorted.toSeq

  private def liveGroups(root: String): Int =
    Option(new java.io.File(s"$root/files").listFiles())
      .getOrElse(Array.empty).count(_.isDirectory)

  test("expire kill points x 3 seeded histories: listed versions stay " +
      "readable with exact content, re-run + vacuum converge to the " +
      "uninterrupted twin, restore targets survivors safely") {
    val points = Seq("mid_manifest_deletes", "post_manifest_deletes",
      "mid_file_deletes")
    for (seed <- 1 to 3; point <- points) {
      val ghost = freshRoot(s"g$seed")
      val crashed = freshRoot(s"c$seed")
      val vg = buildHistory(ghost, seed)
      assert(buildHistory(crashed, seed) == vg)
      val pre = listed(crashed).map(v => v -> content(crashed, v)).toMap
      Versioned.expire(spark, ghost, keepVersions = 2)
      val ex = intercept[RuntimeException] {
        Versioned.expire(spark, crashed, keepVersions = 2, Some(point))
      }
      assert(ex.getMessage.contains("injected crash"))
      // I1: listed => readable, byte-for-byte the pre-op snapshot
      listed(crashed).foreach { ver =>
        assert(content(crashed, ver) == pre(ver),
          s"seed=$seed point=$point: v$ver broken after crash")
      }
      // I2: the interrupted op re-runs to the uninterrupted state
      Versioned.expire(spark, crashed, keepVersions = 2)
      assert(listed(crashed) == listed(ghost), s"seed=$seed point=$point")
      listed(crashed).foreach { ver =>
        assert(content(crashed, ver) == content(ghost, ver),
          s"seed=$seed point=$point: v$ver diverged after re-run")
      }
      // I3: zero-grace vacuum reclaims ALL debris (crash leftovers are
      // orphan-only) and never touches a live group
      Versioned.vacuumOrphans(spark, crashed, graceMs = 0L)
      Versioned.vacuumOrphans(spark, ghost, graceMs = 0L)
      assert(liveGroups(crashed) == liveGroups(ghost),
        s"seed=$seed point=$point: debris survived vacuum (or a live " +
          "group was reclaimed)")
      listed(crashed).foreach { ver =>
        assert(content(crashed, ver) == pre(ver)) }
      // I4: restore to the oldest survivor round-trips its content
      val target = listed(crashed).head
      val nv = Versioned.restore(spark, crashed, target)
      assert(content(crashed, nv) == pre(target),
        s"seed=$seed point=$point: restore($target) diverged")
    }
  }

  test("expectations kill point: a committed version implies its " +
      "quarantine audit record exists, and the re-run lands the " +
      "uninterrupted metrics") {
    val ghost = freshRoot("eg")
    val crashed = freshRoot("ec")
    val batch = (0 until 40).map(i =>
      (i.toLong, if (i % 5 == 0) -1.0 else i * 1.0)).toDF("k", "price")
    val exps = Seq(
      ("price_nonneg", col("price") >= 0),
      ("k_bound", col("k") < 38))
    def metrics(root: String): Seq[(String, Long)] =
      Versioned.writeWithExpectations(batch, root, "k", 1, 2, exps)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    val want = metrics(ghost)
    val ex = intercept[RuntimeException] {
      Versioned.writeWithExpectations(batch, crashed, "k", 1, 2, exps,
        Some("between_writes"))
    }
    assert(ex.getMessage.contains("injected crash"))
    // THE invariant: commit implies audit. A committed version whose
    // violators are recorded nowhere is silent loss of the audit
    // trail (the rows are gone from BOTH the table and quarantine).
    val committed = Versioned.hasVersion(crashed, 1)
    val qExists = new java.io.File(s"$crashed/_quarantine/v=1").exists()
    assert(!committed || qExists,
      "version 1 committed but its quarantine audit record is missing")
    // resume: identical metrics, content, and quarantine as the twin
    assert(metrics(crashed) == want)
    def kp(root: String): Seq[(Long, Double)] =
      Versioned.readAsOf(spark, root, 1).select("k", "price")
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(kp(crashed) == kp(ghost))
    assert(Versioned.quarantine(spark, crashed, 1)
        .select("k").as[Long].collect().sorted.toSeq ==
      Versioned.quarantine(spark, ghost, 1)
        .select("k").as[Long].collect().sorted.toSeq)
  }

  test("compact pre-commit kill + interrupted vacuum: the from-snapshot " +
      "is untouched, debris is orphan-only, both ops re-run to done") {
    val root = freshRoot("cv")
    val v0 = buildHistory(root, 7)
    Versioned.deleteMor(spark, root, "k", Seq(3L, 4L).toDF("k"),
      v0, v0 + 1)
    val from = v0 + 1
    val pre = content(root, from)
    val groupsBefore = liveGroups(root)
    intercept[RuntimeException] {
      Versioned.compact(spark, root, "k", from, from + 1,
        crashAt = Some("pre_commit"))
    }
    assert(!Versioned.hasVersion(root, from + 1),
      "compact half-committed: target version exists after pre-commit kill")
    assert(content(root, from) == pre)
    assert(liveGroups(root) > groupsBefore,
      "expected the orphaned rewrite group on disk")
    intercept[RuntimeException] {
      Versioned.vacuumOrphans(spark, root, graceMs = 0L,
        crashAt = Some("mid_group_deletes"))
    }
    Versioned.vacuumOrphans(spark, root, graceMs = 0L)
    assert(liveGroups(root) == groupsBefore,
      "vacuum re-run did not reclaim exactly the crash debris")
    assert(content(root, from) == pre)
    Versioned.compact(spark, root, "k", from, from + 1)
    assert(content(root, from + 1) == pre)
  }
}
