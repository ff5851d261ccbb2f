package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Seeded fuzz of the change-feed algebra: random commit sequences —
  * COW merges (updates/deletes/inserts, sometimes into net-new key
  * space, sometimes with an evolved column), MOR tombstone commits
  * (including re-deletes of already-dead keys and misses into empty
  * key space), and compactions — with EVERY adjacent diff checked
  * against the brute-force full-outer diff of the two snapshots, and
  * the whole feed checked for per-commit key uniqueness. The
  * manifest-diff CDF must equal "read both snapshots and compare" on
  * every history the commit protocol can produce, not just the
  * fixtures' shapes.
  */
class ChangeFeedFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def bruteDiff(root: String, v: Int): Set[(String, Long)] =
    CdfTestUtil.bruteDiff(spark, root, v)

  private def feedOf(root: String, v: Int): Set[(String, Long)] =
    CdfTestUtil.feedOf(spark, root, v)

  test("changeFeed equals the brute-force snapshot diff across 3 " +
    "random 8-commit histories (merge/deleteMor/compact mix)") {
    (1 to 3).foreach { trial =>
      val root = TempDirs.createCleanedAtExit(s"graft-cdf-fuzz$trial") + "/t"
      val n = 30 + rnd.nextInt(30)
      Versioned.write(
        (0 until n).map(i => (i.toLong, s"s$i", i * 2.0))
          .toDF("k", "status", "price"),
        root, "k", version = 1, nFiles = 1 + rnd.nextInt(5))
      var v = 1
      var tombstoned = false // merge requires a compacted base
      (1 to 8).foreach { step =>
        val live = Versioned.readAsOf(spark, root, v)
          .select("k").as[Long].collect().toSet
        val op = rnd.nextInt(3)
        if (op == 0 && !tombstoned) {
          // COW merge: random updates + deletes over live keys, maybe
          // net-new inserts, maybe an evolved extra column
          val upd = live.filter(_ => rnd.nextBoolean()).take(6).toSeq
          val del = (live -- upd).filter(_ => rnd.nextInt(4) == 0)
            .take(4).toSeq
          val ins = if (rnd.nextBoolean())
            Seq(1000L + step * 10 + rnd.nextInt(5)) else Seq.empty
          val rows =
            upd.map(k => (k, s"u$step-$k", k * 3.0 + step, "U")) ++
            del.map(k => (k, "x", 0.0, "D")) ++
            ins.map(k => (k, s"n$step", 1.0, "U"))
          if (rows.nonEmpty) {
            val base = rows.toDF("k", "status", "price", "op")
            val changes = if (rnd.nextInt(3) == 0)
              base.withColumn("tier",
                when(col("op") === "U", concat(lit("t"), col("k"))))
            else base
            Versioned.merge(spark, root, "k", "op", changes, v, v + 1)
            v += 1
          }
        } else if (op == 1) {
          // MOR tombstones: live keys, re-deletes of dead keys, misses
          val dead = ((0L until n.toLong).toSet -- live)
            .filter(_ => rnd.nextBoolean()).take(2)
          val keys = live.filter(_ => rnd.nextInt(5) == 0).take(5) ++
            dead ++ (if (rnd.nextBoolean()) Seq(9999L) else Seq.empty)
          if (keys.nonEmpty) {
            Versioned.deleteMor(spark, root, "k", keys.toSeq.toDF("k"),
              v, v + 1)
            v += 1; tombstoned = true
          }
        } else {
          Versioned.compact(spark, root, "k", v, v + 1)
          v += 1; tombstoned = false
        }
      }
      // every adjacent diff must equal the manifest-free ground truth
      (2 to v).foreach { ver =>
        val got = feedOf(root, ver)
        val want = bruteDiff(root, ver)
        assert(got == want,
          s"trial $trial v$ver: missed=${want -- got} extra=${got -- want}")
        // and a random pruned range read must equal full-read + filter
        // (same history, so evolution/tombstone states get exercised)
        val lo = rnd.nextInt(n).toLong
        val hi = lo + rnd.nextInt(10)
        val gotR = Versioned.readAsOfWhere(spark, root, ver, "k", lo, hi)
          .select("k").as[Long].collect().sorted.toSeq
        val wantR = Versioned.readAsOf(spark, root, ver)
          .filter(col("k") >= lo && col("k") <= hi)
          .select("k").as[Long].collect().sorted.toSeq
        assert(gotR == wantR, s"trial $trial v$ver range [$lo,$hi]")
      }
      // and within one commit a key appears at most once per image side
      val full = Versioned.changeFeed(spark, root, "k", 1, v)
      val dup = full.groupBy("_commit_version", "_change_type", "k")
        .count().filter(col("count") > 1).count()
      assert(dup == 0, s"trial $trial: duplicate feed rows")
    }
  }
}
