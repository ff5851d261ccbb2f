package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Round-11 gates for the ingest drain's METADATA plane and crash
  * story:
  *
  *  - a 100-micro-batch drain must do O(1) metadata reads per batch
  *    (single checkpointed high-water record + fp-store compaction),
  *    never the O(batches) enumeration that was round-10's one weak;
  *  - a drain killed after commit k (before the checkpoint marks the
  *    batch) must resume from the same checkpoint to a corpus
  *    identical to the uninterrupted run — the put-if-absent commit +
  *    own-batch store exclusion making re-runs exactly-once;
  *  - a LEGACY table (no persisted commit_v) must attribute through
  *    one scan + one aggregation, not an O(versions)-arm union.
  */
class DrainScaleSpec extends SparkSpec {
  import spark.implicits._

  test("long drain (100 micro-batches): per-batch metadata reads are " +
    "O(1)-bounded, the fp store stays compacted, and the result " +
    "matches an independent in-memory model") {
    val nb = 100
    val compactEvery = 8
    val delay = 150L
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-longdrain").toString
    TempDirs.registerCleanedAtExit(scratch)
    val root = s"$scratch/t"
    val storeDir = s"$scratch/store"
    new java.io.File(storeDir).mkdirs()

    // synthetic crawl: per batch k, 6 docs — one in-batch fp dup (the
    // canon must collapse it), one re-crawl of a PRIOR batch's fp
    // (the store must block it), alternating quality, and every 10th
    // batch one far-stale straggler (the watermark must quarantine it)
    def rowsOf(k: Int): Seq[(Long, String, String, Long, Double, Long)] =
      (0 until 6).map { i =>
        val id = k * 10L + i
        val fp =
          if (i == 5 && k > 0) s"f${(k - 1) * 10L}" // prior-batch re-crawl
          else if (i == 4) s"f${k * 10L + 3}"       // in-batch dup of i=3
          else s"f$id"
        val q = if (i % 3 == 2) 0.3 else 0.8
        val ts =
          if (i == 2 && k % 10 == 9) 50L             // far-stale straggler
          else 1000L + k * 100L + i
        (id, s"s${k % 4}", fp, 10L + i, q, ts)
      }

    // independent model of the drain semantics (same rules the
    // st17 fuzz spec pins): batches in order, watermark = max prior
    // ts - delay, late quarantined, per-fp min-id canon, accepted-fp
    // store anti-join, q >= 0.5 gate, commit_v = k+1
    var store = Set.empty[String]
    var seenMax = Option.empty[Long]
    val expect = scala.collection.mutable.Set[(Long, Int, String)]()
    (0 until nb).foreach { k =>
      val batch = rowsOf(k)
      val wm = seenMax.map(_ - delay)
      val (late, onTime) = batch.partition(r => wm.exists(r._6 < _))
      late.foreach(r => expect += ((r._1, k + 1, "late")))
      val canon = onTime.groupBy(_._3).values.map(_.minBy(_._1))
      canon.filter(r => !store.contains(r._3) && r._5 >= 0.5)
        .foreach { r => expect += ((r._1, k + 1, "committed")); store += r._3 }
      if (batch.nonEmpty)
        seenMax = Some(math.max(seenMax.getOrElse(Long.MinValue),
          batch.map(_._6).max))
    }

    // drive the EXACT production batch body, without the streaming
    // engine's per-trigger overhead (the metadata behavior under test
    // lives in the body, not in the trigger loop)
    Streams.drainMetaReads.clear()
    (0 until nb).foreach { k =>
      val batch = rowsOf(k)
        .toDF("doc_id", "source", "fp", "n_tokens", "q", "ts")
        .withColumn("__b", lit(k))
      Streams.ingestBatch(batch, k.toLong, root, storeDir,
        maxStoreBroadcastBytes = 128L << 20,
        eventTime = Some(("ts", delay)), compactEvery = compactEvery)
    }

    // O(1) metadata plane: every batch's store/high-water reads stay
    // under the compaction bound — constant in batch count
    val reads = {
      val it = Streams.drainMetaReads.iterator()
      val b = scala.collection.mutable.ArrayBuffer[Int]()
      while (it.hasNext) b += it.next().intValue()
      b.toSeq
    }
    assert(reads.size == nb)
    val bound = compactEvery + 3
    assert(reads.max <= bound,
      s"metadata reads grew with batch count: max ${reads.max} > " +
        s"$bound (last 10: ${reads.takeRight(10)})")
    // and the fp store itself stays a bounded file set, not a
    // one-file-per-batch swamp
    val storeFiles = Option(new java.io.File(storeDir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".d"))
    assert(storeFiles.length <= compactEvery + 1,
      s"store not compacted: ${storeFiles.length} files")

    // semantics unchanged at 100 batches: engine == model
    val got = Streams.corpusWithLate(spark, root)
      .select("doc_id", "commit_v", "status")
      .as[(Long, Int, String)].collect().toSet
    assert(got == expect.toSet,
      s"engine-only ${(got -- expect).take(5)} " +
        s"model-only ${(expect.toSet -- got).take(5)}")
  }

  test("mid-compaction crash residue is harmless and self-healing: " +
    "duplicated fps across store files (incomplete delete-olds) and a " +
    "stale _ctmp dir (crash before rename) change no results, and the " +
    "next compaction clears both") {
    val compactEvery = 3
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-ctmpcrash").toString
    TempDirs.registerCleanedAtExit(scratch)
    val root = s"$scratch/t"
    val storeDir = s"$scratch/store"
    new java.io.File(storeDir).mkdirs()
    def rowsOf(k: Int) = (0 until 4).map { i =>
      val id = k * 10L + i
      (id, "s0", s"f$id", 10L, 0.8)
    }
    def drive(k: Int): Unit =
      Streams.ingestBatch(
        rowsOf(k).toDF("doc_id", "source", "fp", "n_tokens", "q")
          .withColumn("__b", lit(k)),
        k.toLong, root, storeDir, 128L << 20, None, compactEvery)
    (0 until 3).foreach(drive)
    // plant the two crash residues compaction can leave behind:
    // (1) incomplete delete-olds — a store file duplicated under a
    // fake prior-batch name (same fps now in two files); (2) a stale
    // _ctmp from a compaction that died before its rename
    val b0 = new java.io.File(storeDir, "b0.d")
    val dup = new java.io.File(storeDir, "b99dup.d")
    java.nio.file.Files.walk(b0.toPath).forEach { p =>
      val rel = b0.toPath.relativize(p)
      val t = dup.toPath.resolve(rel)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    new java.io.File(storeDir, "_ctmp77").mkdirs()
    // batch 3 sees 4 prior files (> compactEvery=3): it must compact,
    // clear the stale _ctmp, and still commit exactly its fresh docs
    // (the duplicated fps stay one-survivor)
    (3 until 6).foreach(drive)
    val files = Option(new java.io.File(storeDir).listFiles())
      .getOrElse(Array.empty).map(_.getName)
    assert(!files.exists(_.startsWith("_ctmp")),
      s"stale _ctmp survived: ${files.toSeq}")
    assert(files.count(_.endsWith(".d")) <= compactEvery + 1,
      s"store not compacted: ${files.toSeq}")
    val got = Streams.corpusAttribution(spark, root)
      .select("doc_id", "commit_v")
      .as[(Long, Int)].collect().toSet
    val expect = (0 until 6).flatMap(k =>
      rowsOf(k).map(r => (r._1, k + 1))).toSet
    assert(got == expect,
      s"residue changed results: extra ${(got -- expect).take(5)} " +
        s"missing ${(expect -- got).take(5)}")
  }

  test("crash-resume: a drain killed after commit k resumes from the " +
    "same checkpoint to the identical corpus, for every k (the " +
    "crashed batch re-runs; its own store append must not turn the " +
    "re-run into an empty commit)") {
    val docs = Tables(spark, sf001, "documents").limit(150)
      .select(col("doc_id"), col("source"),
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"),
        round(graft.ops.TextAnalysis.qualityScoreOf(
          graft.ops.TextAnalysis.tokens(lower(col("text"))),
          col("text")), 6).as("q"),
        (col("doc_id") * 7L % 1000L).as("ts"))
    def run(crashAt: Option[Long]): Set[(Long, Int, String)] = {
      val base = java.nio.file.Files
        .createTempDirectory("graft-crashdrain").toString
      TempDirs.registerCleanedAtExit(base)
      val root = s"$base/t"
      val scratch = s"$base/scratch"
      Streams.corpusIngestDrain(docs, root, numBatches = 4,
        eventTime = Some(("ts", 100L)), scratch = Some(scratch),
        crashAfterBatch = crashAt)
      // resume from the same checkpoint after the injected kill
      if (crashAt.isDefined)
        Streams.corpusIngestDrain(docs, root, numBatches = 4,
          eventTime = Some(("ts", 100L)), scratch = Some(scratch))
      Streams.corpusWithLate(spark, root)
        .select("doc_id", "commit_v", "status")
        .as[(Long, Int, String)].collect().toSet
    }
    val uninterrupted = run(None)
    assert(uninterrupted.nonEmpty)
    (0L to 2L).foreach { k =>
      val resumed = run(Some(k))
      assert(resumed == uninterrupted,
        s"kill after batch $k diverged: " +
          s"resumed-only ${(resumed -- uninterrupted).take(5)} " +
          s"uninterrupted-only ${(uninterrupted -- resumed).take(5)}")
    }
  }

  test("batch-volume axis: with keys-per-file forced tiny every " +
    "per-batch fp append writes MULTIPLE part files, and the probe, " +
    "the crashed-attempt re-run's own-append exclusion, and " +
    "compaction all treat the multi-file append as a unit — results " +
    "identical to the single-file regime") {
    val compactEvery = 3
    def runAll(scratch: String): Set[(Long, Int, String)] = {
      val root = s"$scratch/t"
      val storeDir = s"$scratch/store"
      new java.io.File(storeDir).mkdirs()
      // 12 docs/batch: ~9 pass the q gate (> the forced 5 keys/file,
      // so every append is >= 2 part files); one prior-batch re-crawl
      def rowsOf(k: Int): Seq[(Long, String, String, Long, Double, Long)] =
        (0 until 12).map { i =>
          val id = k * 100L + i
          val fp = if (i == 11 && k > 0) s"f${(k - 1) * 100L}"
                   else s"f$id"
          val q = if (i % 4 == 3) 0.3 else 0.8
          (id, "s0", fp, 10L + i, q, 1000L + k * 100L + i)
        }
      def drive(k: Int): Unit = Streams.ingestBatch(
        rowsOf(k).toDF("doc_id", "source", "fp", "n_tokens", "q", "ts")
          .withColumn("__b", lit(k)),
        k.toLong, root, storeDir, 128L << 20,
        Some(("ts", 150L)), compactEvery)
      (0 until 6).foreach(drive)
      // crashed-attempt re-run of the last batch: its own MULTI-FILE
      // append must be excluded as a unit (dir-name exclusion), or
      // the re-run anti-joins against its first attempt's fps and
      // commits an empty version
      drive(5)
      Streams.corpusWithLate(spark, root)
        .select("doc_id", "commit_v", "status")
        .as[(Long, Int, String)].collect().toSet
    }
    def mkTemp(): String = {
      val d = java.nio.file.Files
        .createTempDirectory("graft-volaxis").toString
      TempDirs.registerCleanedAtExit(d)
      d
    }
    val single = runAll(mkTemp())
    assert(single.nonEmpty)
    val prevK = Streams.storeKeysPerFile
    Streams.storeKeysPerFile = 5L
    val multi = try {
      val s = mkTemp()
      val r = runAll(s)
      // the forced regime actually produced multi-file appends
      val appendDirs = Option(new java.io.File(s"$s/store").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("b") && f.getName.endsWith(".d"))
      assert(appendDirs.nonEmpty, "no per-batch appends survived")
      assert(appendDirs.exists(d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.startsWith("part-")) >= 2),
        s"expected a multi-file append at keys-per-file=5: " +
          appendDirs.map(d => d.getName -> d.listFiles().length).toSeq)
      r
    } finally Streams.storeKeysPerFile = prevK
    assert(multi == single,
      s"multi-file regime diverged: multi-only ${(multi -- single).take(5)} " +
        s"single-only ${(single -- multi).take(5)}")
  }

  test("corpusAttribution (legacy table, no persisted commit_v): a " +
    "100-commit table backfills attribution with NO per-version " +
    "union — plan size independent of the commit count — and every " +
    "row attributes to its insert commit") {
    import graft.sources.Versioned
    val root = java.nio.file.Files
      .createTempDirectory("graft-attrlegacy").toString + "/t"
    // no commit_v column anywhere: the table never planned for
    // attribution; inserts land in fresh key space each commit
    val mk = (v: Int) => spark.range(v * 10L, v * 10L + 10L)
      .select(col("id").as("doc_id"), (col("id") % 7).as("payload"))
    Versioned.write(mk(1), root, "doc_id", version = 1, nFiles = 1)
    (2 to 100).foreach { v =>
      Versioned.merge(spark, root, "doc_id", "op",
        mk(v).withColumn("op", lit("U")), v - 1, v)
    }
    val attributed = Streams.corpusAttribution(spark, root)
    val plan = attributed.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), plan.take(1500))
    val got = attributed.select("doc_id", "commit_v")
      .as[(Long, Int)].collect().toMap
    assert(got.size == 1000)
    (1 to 100).foreach(v => (0 until 10).foreach(i =>
      assert(got(v * 10L + i) == v, s"doc ${v * 10L + i}")))
    // a COW rewrite must not re-attribute carried rows: update one
    // early key's payload at v101 and re-check its commit_v stays 1
    Versioned.merge(spark, root, "doc_id", "op",
      mk(1).limit(1).withColumn("payload", lit(99L))
        .withColumn("op", lit("U")), 100, 101)
    val after = Streams.corpusAttribution(spark, root)
      .select("doc_id", "commit_v").as[(Long, Int)].collect().toMap
    assert(after(10L) == 1,
      s"rewritten row re-attributed: ${after(10L)}")
  }
}
