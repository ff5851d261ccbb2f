package graft

import org.apache.spark.sql.functions._

import graft.sources.Versioned

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def table(n: Int) =
    (0 until n).map(i => (i.toLong, s"s$i", i * 10.0))
      .toDF("k", "status", "price")

  test("copy-on-write merge rewrites ONLY range-affected files; old " +
    "snapshots stay readable") {
    val root = TempDirs.createCleanedAtExit("graft-versioned-spec") + "/t"
    Versioned.write(table(20), root, "k", version = 1, nFiles = 4)
    val man1 = Versioned.manifest(spark, root, 1)
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(man1.length == 4, s"expected 4 files, got ${man1.length}")
    assert(man1.map(_._4).sum == 20)
    // ranges are disjoint and ordered (repartitionByRange)
    man1.sliding(2).foreach { w =>
      assert(w(0)._3 < w(1)._2, s"overlapping ranges: ${w.toSeq}")
    }
    // change batch confined to the FIRST file's range (update k=1,
    // delete k=2) plus one net-new key (insert k=100)
    val changes = Seq(
      (1L, "upd", 111.0, "U"),
      (2L, "del", 0.0, "D"),
      (100L, "new", 1000.0, "U")).toDF("k", "status", "price", "op")
    Versioned.merge(spark, root, "k", "op", changes, 1, 2)
    val man2 = Versioned.manifest(spark, root, 2)
      .as[(String, Long, Long, Long)].collect()
    // files whose ranges the batch does NOT touch carry over verbatim
    // (identical path = no rewrite); touched ones must be rewritten
    val touched = man1.filter(e =>
      Seq(1L, 2L).exists(k => k >= e._2 && k <= e._3)).map(_._1).toSet
    val untouchedExp = man1.map(_._1).toSet -- touched
    val carried = man1.map(_._1).toSet.intersect(man2.map(_._1).toSet)
    assert(touched.nonEmpty && untouchedExp.size >= 2, man1.toSeq.toString)
    assert(carried == untouchedExp,
      s"carried=$carried expected=$untouchedExp")
    // v2 content: update applied, delete gone, insert present
    val v2 = Versioned.readAsOf(spark, root, 2)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap
    assert(v2.size == 20, s"19 base + 1 insert, got ${v2.size}")
    assert(v2(1L) == ((1L, "upd", 111.0)))
    assert(!v2.contains(2L))
    assert(v2(100L) == ((100L, "new", 1000.0)))
    assert(v2(7L) == ((7L, "s7", 70.0)))
    // time travel: v1 still reads exactly the original snapshot
    val v1 = Versioned.readAsOf(spark, root, 1)
      .as[(Long, String, Double)].collect().toSet
    assert(v1 == table(20).as[(Long, String, Double)].collect().toSet)
  }

  test("insert-only commit into net-new key space adds a file without " +
    "reading the table; delete-only miss is a pure manifest copy") {
    val root = TempDirs.createCleanedAtExit("graft-versioned-spec2") + "/t"
    Versioned.write(table(10), root, "k", version = 1, nFiles = 2)
    val man1 = Versioned.manifest(spark, root, 1)
      .select("path").as[String].collect().toSet
    // inserts beyond every file's max key
    val ins = Seq((50L, "a", 1.0, "U"), (51L, "b", 2.0, "U"))
      .toDF("k", "status", "price", "op")
    Versioned.merge(spark, root, "k", "op", ins, 1, 2)
    val man2 = Versioned.manifest(spark, root, 2)
      .select("path").as[String].collect().toSet
    assert(man1.subsetOf(man2) && man2.size == man1.size + 1,
      s"expected all ${man1.size} files carried + 1 new, got $man2")
    assert(Versioned.readAsOf(spark, root, 2).count() == 12)
    // deletes whose keys fall in no file's range: commit is metadata-only
    val miss = Seq((999L, "x", 0.0, "D")).toDF("k", "status", "price", "op")
    Versioned.merge(spark, root, "k", "op", miss, 2, 3)
    val man3 = Versioned.manifest(spark, root, 3)
      .select("path").as[String].collect().toSet
    assert(man3 == man2, "delete-miss commit must carry every file")
    assert(Versioned.readAsOf(spark, root, 3).count() == 12)
  }

  test("readAsOfWhere prunes files by manifest key bounds and matches " +
    "the full read + filter") {
    val root = TempDirs.createCleanedAtExit("graft-versioned-spec3") + "/t"
    Versioned.write(table(40), root, "k", version = 1, nFiles = 4)
    val all = Versioned.manifest(spark, root, 1)
      .select("path").as[String].collect().toSet
    // a range inside one file's bounds opens strictly fewer files
    val pruned = Versioned.prunedPaths(spark, root, 1, 2L, 3L)
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"pruning inert: ${pruned.size} of ${all.size}")
    val got = Versioned.readAsOfWhere(spark, root, 1, "k", 2L, 3L)
      .as[(Long, String, Double)].collect().toSet
    val want = Versioned.readAsOf(spark, root, 1)
      .filter($"k" >= 2 && $"k" <= 3)
      .as[(Long, String, Double)].collect().toSet
    assert(got == want && got.size == 2)
    // fully-out-of-range read: zero files opened, schema intact
    val empty = Versioned.readAsOfWhere(spark, root, 1, "k", 900L, 999L)
    assert(empty.count() == 0
      && empty.columns.toSeq == Seq("k", "status", "price"))
  }

  test("expire deletes only files no surviving snapshot references") {
    val root = TempDirs.createCleanedAtExit("graft-versioned-spec4") + "/t"
    Versioned.write(table(20), root, "k", version = 1, nFiles = 4)
    val changes = Seq((1L, "u", 1.0, "U")).toDF("k", "status", "price", "op")
    Versioned.merge(spark, root, "k", "op", changes, 1, 2)
    val man1 = Versioned.manifest(spark, root, 1)
      .select("path").as[String].collect().toSet
    val man2 = Versioned.manifest(spark, root, 2)
      .select("path").as[String].collect().toSet
    val deleted = Versioned.expire(spark, root, keepVersions = 1)
    // exactly the v1-only files (the rewritten first file's ancestor)
    assert(deleted == (man1 -- man2).size && deleted >= 1)
    assert(!Versioned.hasVersion(root, 1))
    // v2 still reads completely
    assert(Versioned.readAsOf(spark, root, 2).count() == 20)
    man2.foreach { p =>
      assert(new java.io.File(new java.net.URI(p).getPath).exists(), p)
    }
  }
}
