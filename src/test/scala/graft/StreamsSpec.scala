package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.queries.RelQueries
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly agg equals the batch groupBy (parity)") {
    val streamed = Streams.runAvailableNow(
      Streams.hourlyAgg(Streams.eventsStream(spark, sf001)), "parity_test")
      .orderBy("hour", "event_type")
      .as[(String, String, Long, Double)].collect()
    val batch = RelQueries.events(spark, sf001)
      .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("hour", "event_type")
      .as[(String, String, Long, Double)].collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("streaming hourly HLL distinct equals the batch estimate " +
      "exactly and lands within rsd bounds of exact") {
    val streamed = Streams.hourlyApproxDistinctDrain(spark, sf001)
      .orderBy("hour").as[(String, Long)].collect()
    val batch = RelQueries.events(spark, sf001)
      .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy("hour")
      .as[(String, Long, Long)].collect()
    assert(streamed.nonEmpty)
    assert(streamed.length == batch.length)
    // HLL++ register-max merge is commutative: micro-batch partials
    // must land on the SAME estimate as the batch aggregation
    streamed.zip(batch).foreach { case ((sh, se), (bh, be, _)) =>
      assert(sh == bh); assert(se == be, s"hour $sh: stream $se batch $be")
    }
    // and the estimate is an estimate of the right thing
    batch.foreach { case (h, est, exact) =>
      assert(math.abs(est - exact) <= math.max(3.0, 5 * 0.02 * exact),
        s"hour $h: est $est exact $exact")
    }
  }

  test("streamStaticDrain equals the batch dimension join (parity) " +
      "and keeps every stream column") {
    val ev = RelQueries.events(spark, sf001)
      .select("event_id", "user_id", "value", "ts")
    val dim = Tables(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val streamed = Streams.streamStaticDrain(ev, dim, "user_id", "c_custkey")
    // stateless enrichment: row count and columns = batch inner join
    assert(streamed.columns.sorted.toSeq ==
      Seq("event_id", "segment", "ts", "user_id", "value"))
    val batch = ev.join(dim, col("user_id") === col("c_custkey"))
      .drop("c_custkey")
    assert(streamed.count() == batch.count())
    val s = streamed.select("event_id", "user_id", "segment")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    val b = batch.select("event_id", "user_id", "segment")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(s.sameElements(b))
  }

  test("streamLeftJoinDrain equals the batch left join, null-extended " +
      "rows included (sentinel flush emits the full tail)") {
    val ev = RelQueries.events(spark, sf001)
      .select("user_id", "event_type", "ts", "value")
    val win = 30 * 60 * 1000L
    val streamed = Streams.streamLeftJoinDrain(ev, windowMs = win)
    // sentinels never leak
    assert(streamed.filter(col("c_user") < 0).count() == 0)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("bc_user"), col("ts").as("bc_ts"),
        col("value").as("bc_value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("bp_user"), col("ts").as("bp_ts"),
        col("value").as("bp_value"))
    val batch = c.join(p,
      expr(s"bc_user = bp_user AND bc_ts >= bp_ts AND " +
        s"bc_ts <= bp_ts + INTERVAL ${win / 1000} SECONDS"), "left_outer")
    assert(streamed.count() == batch.count())
    // the outer tail is non-trivial AND matches batch exactly
    val sNull = streamed.filter(col("p_user").isNull)
      .select("c_user", "c_ts").as[(Long, Timestamp)].collect().sorted
    val bNull = batch.filter(col("bp_user").isNull)
      .select("bc_user", "bc_ts").as[(Long, Timestamp)].collect().sorted
    assert(sNull.nonEmpty && sNull.sameElements(bNull))
  }

  test("sessionizeBatch splits on inactivity gap and sums values") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      Streams.Event(1L, ts(0), 1.0), Streams.Event(1L, ts(10), 2.0),
      Streams.Event(1L, ts(60), 4.0), // 50-min gap -> new session
      Streams.Event(2L, ts(5), 8.0)).toDS()
    val sessions = Streams.sessionizeBatch(ev, gapMs = 30 * 60000L)
      .collect().sortBy(s => (s.user_id, s.start_ts))
    assert(sessions.length == 3)
    assert(sessions(0) ==
      Streams.Session(1L, 0, 10 * 60000L, 2, 3.0))
    assert(sessions(1) ==
      Streams.Session(1L, 60 * 60000L, 60 * 60000L, 1, 4.0))
    assert(sessions(2).user_id == 2L && sessions(2).n_events == 1)
  }

  test("sessionizeStreamDrain equals batch sessionization (parity)") {
    // the real streaming path (file source -> flatMapGroupsWithState ->
    // parquet sink, sentinel-flushed) must emit exactly the batch
    // gap-and-island sessions over the real events
    val ev = RelQueries.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("value"))
    val streamed = Streams.sessionizeStreamDrain(ev, gapMs = 30 * 60000L)
      .as[Streams.Session].collect()
      .map(s => (s.user_id, s.start_ts) -> s).toMap
    val batch = Streams.sessionizeBatch(ev.as[Streams.Event],
        gapMs = 30 * 60000L)
      .collect().map(s => (s.user_id, s.start_ts) -> s).toMap
    assert(streamed.keySet == batch.keySet,
      s"onlyStream=${streamed.keySet -- batch.keySet} " +
        s"onlyBatch=${batch.keySet -- streamed.keySet}")
    streamed.foreach { case (k, s) =>
      val b = batch(k)
      assert(s.n_events == b.n_events && s.end_ts == b.end_ts &&
        math.abs(s.total_value - b.total_value) < 1e-9, s"$s vs $b")
    }
  }

  test("sessionWindowStreamDrain equals the batch session_window " +
    "aggregation (parity)") {
    // the native session_window drain (state-store window merging,
    // sentinel-flushed watermark) must emit exactly the batch
    // session_window result over the real events
    val ev = RelQueries.events(spark, sf001)
      .select(col("ts"), col("user_id"), col("value"))
    val streamed = Streams.sessionWindowStreamDrain(spark, sf001,
        gapMinutes = 30)
      .select(col("user_id"), col("s_start"), col("dur_ms"),
        col("n_events"), col("total_value"))
      .as[(Long, Timestamp, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val batch = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        (unix_millis(col("session_window.end"))
          - unix_millis(col("session_window.start"))).as("dur_ms"),
        col("n_events"), col("total_value"))
      .as[(Long, Timestamp, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(streamed.keySet == batch.keySet,
      s"onlyStream=${(streamed.keySet -- batch.keySet).take(3)} " +
        s"onlyBatch=${(batch.keySet -- streamed.keySet).take(3)}")
    streamed.foreach { case (k, s) => assert(s == batch(k)) }
  }

  test("stateful sessionize persists open sessions across restarts") {
    // cross-batch state via the restart path: two AvailableNow drains
    // over a growing file source, sharing one checkpoint — the open
    // session must survive the first query's shutdown via the state
    // store and close when the gap-crossing event arrives in run 2.
    def ts(min: Long) = new Timestamp(min * 60000L)
    val srcDir = java.nio.file.Files.createTempDirectory("sess-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))

    val outDir = java.nio.file.Files.createTempDirectory("sess-out").toString

    def drain(): Unit = {
      val ev = spark.readStream.schema(schema).parquet(srcDir)
        .as[Streams.Event]
      // durable sink: memory sink cannot recover from a checkpoint
      val q = Streams.sessionize(ev, gapMs = 30 * 60000L, useTimeout = false)
        .writeStream.format("parquet")
        .option("path", outDir)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def sessions() = spark.read.schema(
        org.apache.spark.sql.Encoders.product[Streams.Session].schema)
      .parquet(outDir).as[Streams.Session].collect()

    Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0)).toDF("user_id", "ts", "value")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(sessions().isEmpty) // session still open, lives in state store

    Seq((1L, ts(90), 4.0)).toDF("user_id", "ts", "value")
      .write.mode("append").parquet(srcDir)
    drain()
    val closed = sessions()
    assert(closed.length == 1)
    assert(closed(0) == Streams.Session(1L, 0, 10 * 60000L, 2, 3.0))
  }

  test("upsertStreamDrain: incremental merge equals the batch argmax") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    // three versions of key 1 spread over four micro-batches, one of
    // key 2; same-timestamp tie on key 2 broken by event_id
    val ev = Seq(
      (1L, ts(10), 101L, "a", 1.0), (1L, ts(30), 103L, "c", 3.0),
      (1L, ts(20), 102L, "b", 2.0), (2L, ts(5), 104L, "d", 4.0),
      (2L, ts(5), 105L, "e", 5.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val state = Streams.upsertStreamDrain(ev, "user_id",
        Seq("ts", "event_id"), numBatches = 4)
      .select("user_id", "event_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(state == Set((1L, 103L, "c", 3.0), (2L, 105L, "e", 5.0)))
  }

  test("upsert state survives a mid-stream restart (checkpoint recovery " +
      "resumes the version chain from disk)") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val srcDir = java.nio.file.Files.createTempDirectory("st05r-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("st05r-ckpt").toString
    val stateRoot = java.nio.file.Files
      .createTempDirectory("st05r-state").toString
    val schemaDf = Seq((1L, ts(0), 0L, "x", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val schema = schemaDf.schema
    def resume() = Streams.upsertStreamResume(spark, srcDir, schema,
      stateRoot, ckpt, "user_id", Seq("ts", "event_id"))

    // run 1: two versions of key 1, one of key 2, then "the process
    // dies" (query terminates; nothing driver-side survives — the merge
    // chain exists only in stateRoot + the checkpoint)
    Seq((1L, ts(10), 101L, "a", 1.0), (1L, ts(30), 103L, "c", 3.0),
      (2L, ts(5), 104L, "d", 4.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("append").parquet(srcDir)
    val s1 = resume().select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet
    assert(s1 == Set((1L, 103L), (2L, 104L)))

    // run 2 (the restart): new files only — the checkpoint skips run
    // 1's inputs, and the merge must pick up state from disk. A stale
    // update (ts 20 < ts 30) must lose against the RECOVERED state of
    // key 1, which is only possible if the chain resumed correctly.
    Seq((1L, ts(20), 102L, "b", 2.0), (3L, ts(40), 106L, "f", 6.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("append").parquet(srcDir)
    val s2 = resume().select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet
    assert(s2 == Set((1L, 103L), (2L, 104L), (3L, 106L)))

    // run 3: no new input — a no-op resume must leave state unchanged
    // (idempotence of the versioned chain under spurious restarts)
    val s3 = resume().select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet
    assert(s3 == s2)

    TempDirs.rmTree(srcDir); TempDirs.rmTree(ckpt); TempDirs.rmTree(stateRoot)
  }

  test("transformWithState totals equal the batch groupBy and are " +
      "micro-batch-count invariant (state persists across batches)") {
    val ev = RelQueries.events(spark, sf001).select("user_id", "value")
    def run(n: Int) = Streams.transformWithStateDrain(ev, numBatches = n)
      .select($"user_id", $"n_events",
        org.apache.spark.sql.functions.round($"sum_value", 4))
      .as[(Long, Long, Double)].collect().toSet
    val batch = ev.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("value"), 4).as("s"))
      .select($"user_id", $"n", $"s")
      .as[(Long, Long, Double)].collect().toSet
    val three = run(3)
    assert(three == batch)
    assert(run(1) == three)
  }

  test("upsertStreamDrain final state is batch-partitioning invariant") {
    val ev = RelQueries.events(spark, sf001)
      .select("user_id", "ts", "event_id", "event_type", "value")
    def run(n: Int) = Streams.upsertStreamDrain(ev, "user_id",
        Seq("ts", "event_id"), numBatches = n)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    // the merge is commutative: 1 batch (pure batch argmax) == 5
    assert(run(1) == run(5))
  }

  test("versionedSinkDrain: batched COW commits equal the one-shot " +
    "merge; every intermediate version stays readable") {
    import graft.sources.Versioned
    val base = (0L until 50L).map(i => (i, s"s$i", i * 2.0))
      .toDF("k", "status", "price")
    val changes = Seq(
      (3L, "u3", 300.0, "U"), (17L, "u17", 1700.0, "U"),
      (26L, "x", 0.0, "D"), (44L, "u44", 4400.0, "U"),
      (90L, "new", 900.0, "U")).toDF("k", "status", "price", "op")
    val root = TempDirs.createCleanedAtExit("graft-st13-spec") + "/t"
    val got = Streams.versionedSinkDrain(base, changes, "k", "op",
        root, numBatches = 3)
      .as[(Long, String, Double)].collect().toSet
    val want = graft.rel.Relational
      .mergeUpsert(base, changes, "k", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
    // commit chain: v1 (base) .. v(1+batches), each snapshot readable
    val latest = Versioned.latestVersion(root)
    assert(latest == 4, s"expected 4 versions, got $latest")
    assert(Versioned.readAsOf(spark, root, 1)
      .as[(Long, String, Double)].collect().toSet
      == base.as[(Long, String, Double)].collect().toSet)
    // intermediate counts depend on which batch carried the insert vs
    // the delete: base 50, so anywhere in [49, 51] mid-chain; the
    // FINAL version must land exactly on base - 1 delete + 1 insert
    (2 to latest).foreach { v =>
      val n = Versioned.readAsOf(spark, root, v).count()
      assert(n >= 49 && n <= 51, s"v$v rows=$n")
    }
    assert(Versioned.readAsOf(spark, root, latest).count() == 50)
  }

  test("changeFeedStreamDrain: the streamed CDC-out equals the one-shot " +
    "change feed, with per-commit attribution intact") {
    import graft.sources.Versioned
    val base = (0L until 50L).map(i => (i, s"s$i", i * 2.0))
      .toDF("k", "status", "price")
    val changes = Seq(
      (3L, "u3", 300.0, "U"), (17L, "u17", 1700.0, "U"),
      (26L, "x", 0.0, "D"), (44L, "u44", 4400.0, "U"),
      (90L, "new", 900.0, "U")).toDF("k", "status", "price", "op")
    val root = TempDirs.createCleanedAtExit("graft-st14-spec") + "/t"
    Streams.versionedSinkDrain(base, changes, "k", "op", root,
      numBatches = 3)
    val drained = Streams.changeFeedStreamDrain(spark, root, "k")
    val latest = Versioned.latestVersion(root)
    // key-disjoint commits: the union of per-commit feeds equals the
    // net v1 -> latest diff, row for row
    val got = drained
      .select("_change_type", "k", "status", "price")
      .as[(String, Long, String, Double)].collect().toSet
    val want = Versioned.changeFeed(spark, root, "k", 1, latest)
      .select("_change_type", "k", "status", "price")
      .as[(String, Long, String, Double)].collect().toSet
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
    assert(got.map(_._1) == Set("delete", "insert",
      "update_preimage", "update_postimage"))
    // per-commit attribution: every change carries the version of the
    // micro-batch commit that produced it, none attributed to the base
    val vs = drained.select("_commit_version").distinct()
      .as[Int].collect().toSet
    assert(vs.subsetOf((2 to latest).toSet) && vs.nonEmpty, s"got $vs")
    // each key appears in exactly one commit (its batch's)
    val perKey = drained.groupBy("k")
      .agg(countDistinct("_commit_version").as("nv"))
      .as[(Long, Long)].collect()
    assert(perKey.forall(_._2 == 1L), perKey.mkString(","))
    // expired history: drop all but the last two snapshots — the
    // oldest SURVIVOR becomes the emit-nothing base (not v=1, whose
    // manifest is gone), and the drain still feeds the last commit
    Versioned.expire(spark, root, keepVersions = 2)
    val afterExpire = Streams.changeFeedStreamDrain(spark, root, "k")
    val want2 = Versioned.changeFeed(spark, root, "k",
        latest - 1, latest)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
    assert(afterExpire.select("_change_type", "k")
      .as[(String, Long)].collect().toSet == want2,
      "post-expire drain diverged from the surviving-range feed")
  }

  test("streamingMvDrain: per-commit delta maintenance equals the full " +
    "recompute at EVERY version, and a re-run drain is idempotent") {
    import graft.sources.Versioned
    val base = (0L until 50L).map(i => (i, s"g${i % 5}", i * 2.0))
      .toDF("k", "status", "price")
    val changes = Seq(
      (3L, "g9", 300.0, "U"),   // update moves key between groups
      (17L, "g9", 1700.0, "U"),
      (26L, "x", 0.0, "D"),     // delete shrinks its group
      (44L, "g0", 4400.0, "U"), // update within a group (value only)
      (90L, "gN", 900.0, "U")). // insert opens a new group
      toDF("k", "status", "price", "op")
    val root = TempDirs.createCleanedAtExit("graft-st15-spec") + "/t"
    val sink = TempDirs.createCleanedAtExit("graft-st15-spec-mv")
    Streams.versionedSinkDrain(base, changes, "k", "op", root,
      numBatches = 3)
    def cents = floor(col("price") * 100 + 0.5).cast("long")
    def recompute(v: Int) =
      Versioned.readAsOf(spark, root, v).groupBy("status")
        .agg(count(lit(1)).as("n_rows"), sum(cents).as("cents"))
        .as[(String, Long, Long)].collect().toSet
    val got = Streams.streamingMvDrain(spark, root, "k", "status",
        "price", Some(sink))
      .as[(String, Long, Long)].collect().toSet
    val latest = Versioned.latestVersion(root)
    assert(got == recompute(latest),
      s"final MV != recompute: ${got -- recompute(latest)}")
    // EVERY intermediate MV state equals that snapshot's recompute —
    // the incremental algebra holds commit by commit, not just in sum
    (1 to latest).foreach { v =>
      val mvV = spark.read.parquet(s"$sink/mv_v$v")
        .as[(String, Long, Long)].collect().toSet
      assert(mvV == recompute(v), s"mv_v$v diverged from recompute")
    }
    // restart/re-run safety: a second drain over the SAME sink (fresh
    // checkpoint — every batch re-executes) overwrites every version-
    // keyed state with identical content
    val rerun = Streams.streamingMvDrain(spark, root, "k", "status",
        "price", Some(sink))
      .as[(String, Long, Long)].collect().toSet
    assert(rerun == got, "re-run drain diverged")
    (1 to latest).foreach { v =>
      val mvV = spark.read.parquet(s"$sink/mv_v$v")
        .as[(String, Long, Long)].collect().toSet
      assert(mvV == recompute(v), s"mv_v$v not idempotent under re-run")
    }
  }

  test("corpusIngestDrain (st16): one winner per fingerprint, all " +
    "commits readable and growing, and no planted re-crawl coexists " +
    "with its original") {
    import graft.sources.Versioned
    val out = graft.queries.StreamQueries.queries("st16_stream_ingest")(
      spark, sf001).collect()
    assert(out.nonEmpty)
    val key = (sf001.hashCode.toLong & 0xffffffffL).toHexString
    val root = new java.io.File(
      graft.TempDirs.scratchRoot, s"graft-st16-${key}b")
      .getAbsolutePath
    assert(Versioned.latestVersion(root) == 4)
    // one winner per fingerprint in the final corpus
    val snap = Versioned.readAsOf(spark, root, 4)
    assert(snap.select("fp").distinct().count() == snap.count(),
      "duplicate content in the ingested corpus")
    // the corpus only grows across ingest commits
    val sizes = (1 to 4).map(v => Versioned.readAsOf(spark, root, v).count())
    assert(sizes.sliding(2).forall(p => p(1) >= p(0)), sizes.toString)
    // a doc and its planted re-crawl never BOTH survive
    val ids = out.map(_.getLong(0)).toSet
    val off = (graft.Tables(spark, sf001, "documents")
      .agg(max("doc_id")).head().getLong(0) / 1000000L + 1L) * 1000000L
    val both = ids.filter(id => id < off && id % 10 == 0 && ids(id + off))
    assert(both.isEmpty, s"original+copy both survived: ${both.take(5)}")
    // every winner passed the gate
    assert(out.forall(_.getDouble(3) >= 0.5))
  }

  test("event-time ingest (st17): ancient re-crawls quarantine past " +
    "the watermark, within-delay re-crawls flow through the store, " +
    "and no content is ever committed twice") {
    val out = graft.queries.StreamQueries.queries(
      "st17_stream_ingest_late")(spark, sf001).collect()
    val off = (graft.Tables(spark, sf001, "documents")
      .agg(max("doc_id")).head().getLong(0) / 1000000L + 1L) * 1000000L
    val byStatus = out.groupBy(_.getString(5))
    val late = byStatus.getOrElse("late", Array.empty)
    val committed = byStatus.getOrElse("committed", Array.empty)
    // late rows exist and every one is an ANCIENT re-crawl (+off ids)
    // from a post-first batch (batch 0 has no watermark yet)
    assert(late.nonEmpty, "no late rows — the watermark never fired")
    assert(late.forall(r => r.getLong(0) >= off && r.getLong(0) < 2 * off),
      s"non-ancient doc quarantined: ${late.map(_.getLong(0)).take(5).toSeq}")
    assert(late.forall(_.getInt(4) > 1), "late row in batch 0")
    // within-delay re-crawls (+2·off) are NEVER quarantined — they are
    // ordinary duplicates for the store to block
    assert(!late.exists(_.getLong(0) >= 2 * off))
    // a doc id appears exactly once across both arms
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // dedup still holds: no committed doc shares content with another
    // (ids of originals and copies differ but fps collide — committed
    // originals+copies per planted pair must be exactly one)
    val committedIds = committed.map(_.getLong(0)).toSet
    val bothOrigAndCopy = committedIds.filter(id =>
      id < off && id % 10 == 0 &&
        (committedIds(id + off) || committedIds(id + 2 * off)))
    assert(bothOrigAndCopy.isEmpty,
      s"content committed twice: ${bothOrigAndCopy.take(5)}")
  }

  test("event-time ingest fuzz: the drain matches an INDEPENDENT " +
    "in-memory reference model on seeded random corpora (guards " +
    "against engine/oracle co-drift — same author wrote both)") {
    // plain-JVM twin of TextAnalysis.hashUniform (first 8 md5 hex
    // digits over id+salt as uint32 / 2^32)
    def hashU(id: Long, salt: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + salt).getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16)
        .toDouble / 4294967296.0
    }
    val nb = 3; val delay = 300L
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 60).map { i =>
        (i.toLong, "s" + (i % 3), "fp" + rnd.nextInt(12),
          (i % 7 + 1).toLong,
          if (rnd.nextBoolean()) 0.7 else 0.3,
          1000L + rnd.nextInt(1000))
      }
      // reference model: batches in bid order, watermark = max prior
      // ts - delay, late quarantined, per-fp min-id canon, store
      // anti-join, gate, commit = bid+1
      val byBid = rows.groupBy(r => (hashU(r._1, "ingest") * nb).toInt)
      var store = Set.empty[String]
      var seenMax = Option.empty[Long]
      val expect = scala.collection.mutable.Set[(Long, Int, String)]()
      (0 until nb).foreach { b =>
        val batch = byBid.getOrElse(b, Seq.empty)
        val wm = seenMax.map(_ - delay)
        val (late, onTime) = batch.partition(r =>
          wm.exists(w => r._6 < w))
        late.foreach(r => expect += ((r._1, b + 1, "late")))
        val canon = onTime.groupBy(_._3).values.map(_.minBy(_._1))
        canon.filter(r => !store.contains(r._3) && r._5 >= 0.5)
          .foreach { r =>
            expect += ((r._1, b + 1, "committed")); store += r._3
          }
        if (batch.nonEmpty)
          seenMax = Some(math.max(seenMax.getOrElse(Long.MinValue),
            batch.map(_._6).max))
      }
      val docs = rows
        .toDF("doc_id", "source", "fp", "n_tokens", "q", "ts")
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-st17fuzz$seed").toString + "/t"
      val got = Streams.corpusIngestDrain(docs, root, numBatches = nb,
        eventTime = Some(("ts", delay)))
        .select("doc_id", "commit_v", "status")
        .as[(Long, Int, String)].collect().toSet
      assert(got == expect.toSet,
        s"seed $seed: engine-only ${(got -- expect).take(5)} " +
          s"model-only ${(expect.toSet -- got).take(5)}")
    }
  }

  test("corpusIngestDrain: a 1-byte store-broadcast cap (shuffle " +
    "anti-join regime) commits the identical corpus — the probe's " +
    "regime never changes results") {
    import graft.sources.Versioned
    import graft.ops.TextAnalysis
    val scored = graft.Tables(spark, sf001, "documents")
      .limit(200)
      .select(col("doc_id"), col("source"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        round(TextAnalysis.qualityScoreOf(
          TextAnalysis.tokens(lower(col("text"))), col("text")), 6)
          .as("q"))
    def drain(cap: Long): Set[(Long, Int)] = {
      val root = java.nio.file.Files
        .createTempDirectory("graft-st16cap").toString + "/t"
      Streams.corpusIngestDrain(scored, root, numBatches = 3,
        maxStoreBroadcastBytes = cap)
        .select("doc_id", "commit_v")
        .as[(Long, Int)].collect().toSet
    }
    val shuffled = drain(1L)
    val bcast = drain(128L << 20)
    assert(shuffled == bcast,
      s"regimes diverged: ${(shuffled diff bcast).take(3)} vs " +
        s"${(bcast diff shuffled).take(3)}")
  }

  test("corpusAttribution: with commit_v persisted at commit time a " +
    "100-commit table attributes in ONE scan — zero joins, zero " +
    "unions, plan size independent of the commit count") {
    import graft.sources.Versioned
    val root = java.nio.file.Files
      .createTempDirectory("graft-attr100").toString + "/t"
    val mk = (v: Int) => spark.range(v * 10L, v * 10L + 10L)
      .select(col("id").as("doc_id"), lit(v).as("commit_v"))
    Versioned.write(mk(1), root, "doc_id", version = 1, nFiles = 1)
    (2 to 100).foreach { v =>
      Versioned.merge(spark, root, "doc_id", "op",
        mk(v).withColumn("op", lit("U")), v - 1, v)
    }
    val attributed = Streams.corpusAttribution(spark, root)
    val plan = attributed.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan.take(1500))
    assert(!plan.contains("Union"), plan.take(1500))
    // values: every row carries the commit that inserted it
    val got = attributed.select("doc_id", "commit_v")
      .as[(Long, Int)].collect().toMap
    assert(got.size == 1000)
    (1 to 100).foreach(v => (0 until 10).foreach(i =>
      assert(got(v * 10L + i) == v, s"doc ${v * 10L + i}")))
  }
}
