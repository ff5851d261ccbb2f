package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Streaming queries surfaced through the batch Verify contract: each
  * runs a Structured Streaming job with Trigger.AvailableNow to
  * completion and returns the drained memory table. st01's oracle is
  * the same SQL as the batch q16 — streaming/batch parity is the check.
  */
object StreamQueries {

  /** Build-once fixture shared by st13/st14: the orders snapshot
    * streamed into a Versioned COW table — v1 = base load, v2..v5 =
    * the timeTravelChanges batch drained as 4 micro-batch MERGE
    * commits (streaming CDC in; st14 reads the same commits back out).
    */
  private def streamSinkRoot(s: SparkSession, dir: String): String = {
    import graft.sources.Versioned
    val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
    val root = new java.io.File(
      graft.TempDirs.scratchRoot, s"graft-st13-$key")
      .getAbsolutePath
    if (!Versioned.hasVersion(root, 2)) {
      graft.TempDirs.registerCleanedAtExit(root)
      val base = graft.Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Streams.versionedSinkDrain(base,
        RelQueries.timeTravelChanges(base), "o_orderkey", "op", root,
        numBatches = 4)
    }
    root
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // watermarked event-time hourly window through the scale path:
    // append-mode parquet sink with sentinel-advanced watermark (each
    // window emitted exactly once, state evicted) — streaming == batch
    "st01_stream_hourly" -> ((s, dir) =>
      Streams.hourlyAggStreamDrain(s, dir)
        .orderBy("hour", "event_type")),

    // custom sessionization state machine (30-minute inactivity gap)
    // through the REAL streaming path — file source →
    // flatMapGroupsWithState → parquet sink — then aggregated to keep
    // the result dimension-sized; oracle is the classic gap-and-island
    // SQL (lag + cumulative break count)
    "st02_sessions" -> ((s, dir) => {
      val ev = RelQueries.events(s, dir)
        .select(col("user_id"), col("ts"), col("value"))
      Streams.sessionizeStreamDrain(ev, gapMs = 30 * 60 * 1000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("n_events"),
          round(sum("total_value"), 4).as("total_value"))
        .filter(col("user_id") < 50)
        .orderBy("user_id")
    }),

    // watermarked streaming dedup (at-least-once delivery repair):
    // events tripled to simulate redelivery, then
    // dropDuplicatesWithinWatermark(event_id) — bounded state, first
    // arrival wins. Oracle: the original distinct event set.
    "st03_stream_dedup" -> ((s, dir) => {
      val ev = RelQueries.events(s, dir)
        .select("event_id", "user_id", "event_type", "value", "ts")
      val redelivered = ev.unionByName(ev).unionByName(ev)
      Streams.dedupStreamDrain(redelivered, Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")
    }),

    // stream-stream inner join: clicks correlated to the same user's
    // purchases within 30 minutes after the purchase; watermarks on
    // both sides bound the join state. Aggregated per user after the
    // drain to keep the check dimension-sized.
    "st04_stream_join" -> ((s, dir) => {
      val ev = RelQueries.events(s, dir)
        .select("user_id", "event_type", "ts", "value")
      Streams.streamJoinDrain(ev, windowMs = 30 * 60 * 1000L)
        .groupBy(col("c_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum("p_value"), 4).as("purchase_value"))
        .orderBy("user_id")
    }),

    // foreachBatch keyed upsert: four micro-batches merge into a
    // latest-event-per-user parquet state (versioned, idempotent) —
    // the serving-table maintenance pattern; oracle is the batch
    // argmax row per user
    "st05_stream_upsert" -> ((s, dir) => {
      val ev = RelQueries.events(s, dir)
        .select("user_id", "ts", "event_id", "event_type", "value")
      Streams.upsertStreamDrain(ev, "user_id", Seq("ts", "event_id"))
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("user_id")
    }),

    // stream-static enrichment: the event stream joined per micro-batch
    // to a broadcast customer×nation dimension — STATELESS (no
    // watermark, no state store; the stream never shuffles), the
    // standard fact-stream + catalog-dim topology. Aggregated per
    // (nation, segment) after the drain; oracle is the plain batch
    // join, streaming == batch.
    "st06_stream_static" -> ((s, dir) => {
      val ev = RelQueries.events(s, dir)
        .select("user_id", "event_type", "value", "ts")
      val dim = graft.Tables(s, dir, "customer")
        .join(graft.Tables(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("nation"),
          col("c_mktsegment").as("segment"))
      Streams.streamStaticDrain(ev, dim, "user_id", "c_custkey")
        .groupBy("nation", "segment")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 4).as("sum_value"))
        .orderBy("nation", "segment")
    }),

    // sliding event-time windows (1h/15min) through the streaming
    // path: overlapping-window state (4 windows live per event) still
    // bounded and evicted by the watermark, append sink emits each
    // window exactly once. Oracle = the same arithmetic window
    // enumeration as batch q42 — streaming == batch on overlapping
    // windows too.
    "st07_stream_sliding" -> ((s, dir) =>
      Streams.hourlyAggStreamDrain(s, dir, slide = Some("15 minutes"))
        .withColumnRenamed("hour", "w_start")
        .orderBy("w_start", "event_type")),

    // sessionization via the NATIVE session_window aggregate (the
    // engine-managed formulation — state-store window merging,
    // watermark finalization, append emits each closed session once);
    // session grain like q52, with end = last event + gap by
    // session_window's definition. Oracle: gap-and-island replay with
    // the +gap duration.
    "st09_session_window" -> ((s, dir) =>
      Streams.sessionWindowStreamDrain(s, dir, gapMinutes = 30)
        .filter(col("user_id") < 50)
        .select(col("user_id"),
          date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          col("dur_ms"), col("n_events"), col("total_value"))
        .orderBy("user_id", "s_start")),

    // hourly approximate distinct users through the real streaming
    // path (rows-only: the HLL++ estimate has no SQL-oracle twin,
    // q43's precedent; StreamsSpec asserts the streaming estimate
    // EQUALS the batch approx_count_distinct exactly — register-max
    // merge is commutative — and lands within rsd bounds of exact)
    "st10_stream_approx_distinct" -> ((s, dir) =>
      Streams.hourlyApproxDistinctDrain(s, dir)
        .orderBy("hour")),

    // per-hour top-3 events by value through the REAL streaming path,
    // ranked by the native k-bounded TopKPairs aggregate inside the
    // watermarked window aggregation — window state is the O(k) heap
    // buffer in the state store, never the hour's event set. Oracle:
    // batch ROW_NUMBER replay over the same hour windows.
    "st11_stream_topk" -> ((s, dir) =>
      Streams.topkStreamDrain(s, dir, k = 3)
        .orderBy("hour", "rank")),

    // per-user lifetime totals through Spark 4's transformWithState
    // (typed ValueState in a RocksDB store; update-mode re-emits per
    // batch; 3 forced micro-batches so state provably persists across
    // batches — the max-n row equals the batch groupBy iff it did).
    // Oracle: the plain batch aggregation.
    // streaming CDC into the Versioned copy-on-write table: the change
    // batch streams in 4 micro-batches, each committed as one COW
    // MERGE version (time travel across batch boundaries; only
    // key-range-affected files rewrite per batch). Final content must
    // equal the single-shot merge — batching is invisible (the oracle
    // replays the one-shot merge grouped by status); commit-chain
    // idempotence and per-version readability are StreamsSpec-gated.
    "st13_stream_versioned_sink" -> ((s, dir) => {
      import graft.sources.Versioned
      val root = streamSinkRoot(s, dir)
      Versioned.readAsOf(s, root, Versioned.latestVersion(root))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // streaming CDC-OUT of the stream-built table: tail its manifest
    // directory (the commit log) as a file stream — one micro-batch
    // per COW commit — and emit each commit's change feed. The 4
    // commits' batches are key-disjoint, so the union of per-commit
    // feeds equals the net v1→v5 diff, which is exactly q87's feed
    // shape replayed by the oracle; per-commit attribution and
    // drained==one-shot equivalence are StreamsSpec-gated.
    "st14_cdc_read" -> ((s, dir) => {
      val root = streamSinkRoot(s, dir)
      Streams.changeFeedStreamDrain(s, root, "o_orderkey")
        .groupBy("_change_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents"),
          min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"))
        .orderBy("_change_type")
    }),

    // STREAMING corpus ingest-curation (the continuous-crawl regime;
    // the streaming closure of p03): scored docs arrive in 4
    // content-keyed micro-batches; each runs in-batch fp dedup, an
    // accumulated-store anti-join, and the quality gate, committing
    // survivors as version batchId+1. Output = final corpus read back
    // through the versioned layer with commit attribution FROM the
    // change feed; the oracle replays winner = first-batch-canonical-
    // passing-the-gate per fingerprint over the SAME md5 batch split,
    // so ONE equality gates the split, the store semantics, the gate,
    // all four commits, and the CDF.
    "st16_stream_ingest" -> ((s, dir) => {
      import graft.sources.Versioned
      val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
      // `b` suffix (st16/17/18, round 15): fixture-generation code
      // changed in round 14 (fanOut of the base scan) without a dir
      // bump, so a stale pre-change fixture left by a killed JVM could
      // be silently reused; new dir names retire any such leftovers
      // (ADVICE r14)
      val root = new java.io.File(
        graft.TempDirs.scratchRoot, s"graft-st16-${key}b")
        .getAbsolutePath
      if (!Versioned.hasVersion(root, 4)) {
        graft.TempDirs.registerCleanedAtExit(root)
        val base = graft.Tables.fanOut(graft.Tables(s, dir, "documents"))
        // planted re-crawls: every 10th doc appears AGAIN under a
        // fresh max-key-derived id — its hash batch is independent of
        // the original's, so the pair exercises every store outcome
        // (same batch -> in-batch dedup; original first -> store
        // blocks the copy; copy first -> copy wins, original blocked;
        // all replayed by the oracle's first-batch-canonical rule)
        val off = (base.agg(max(col("doc_id"))).head().getLong(0)
          / 1000000L + 1L) * 1000000L
        val withCopies = base.select("doc_id", "source", "text")
          .unionByName(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + off).as("doc_id"), col("source"),
              col("text")))
        val scored = withCopies
          .select(col("doc_id"), col("source"),
            graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
            graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
              .as("n_tokens"),
            round(graft.ops.TextAnalysis.qualityScoreOf(
              graft.ops.TextAnalysis.tokens(lower(col("text"))),
              col("text")), 6).as("q"))
        Streams.corpusIngestDrain(scored, root, numBatches = 4)
      }
      Streams.corpusAttribution(s, root)
        .select("doc_id", "source", "n_tokens", "q", "commit_v")
        .orderBy("doc_id")
    }),

    // st16's drain with store COMPACTION FORCED inside the replayed
    // window (compactEvery = 1: the 3rd and 4th batches EACH fold the
    // prior store files — two folds, one over per-batch appends and
    // one over a prior compaction's output): compaction is pure
    // metadata-plane work, so the committed corpus must hash-match
    // st16's oracle VERBATIM. The long-drain spec gates compaction at
    // 100 batches against a model; this entry puts the neutrality
    // claim under the driver's independent gate.
    "st18_stream_ingest_compacted" -> ((s, dir) => {
      import graft.sources.Versioned
      val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
      val root = new java.io.File(
        graft.TempDirs.scratchRoot, s"graft-st18-${key}b")
        .getAbsolutePath
      if (!Versioned.hasVersion(root, 4)) {
        graft.TempDirs.registerCleanedAtExit(root)
        val base = graft.Tables.fanOut(graft.Tables(s, dir, "documents"))
        val off = (base.agg(max(col("doc_id"))).head().getLong(0)
          / 1000000L + 1L) * 1000000L
        val withCopies = base.select("doc_id", "source", "text")
          .unionByName(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + off).as("doc_id"), col("source"),
              col("text")))
        val scored = withCopies
          .select(col("doc_id"), col("source"),
            graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
            graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
              .as("n_tokens"),
            round(graft.ops.TextAnalysis.qualityScoreOf(
              graft.ops.TextAnalysis.tokens(lower(col("text"))),
              col("text")), 6).as("q"))
        Streams.corpusIngestDrain(scored, root, numBatches = 4,
          compactEvery = 1)
      }
      Streams.corpusAttribution(s, root)
        .select("doc_id", "source", "n_tokens", "q", "commit_v")
        .orderBy("doc_id")
    }),

    // EVENT-TIME ingest with LATE re-crawls (st17): st16's drain
    // under a watermark. Deterministic event times: originals at
    // 1,000,000 + (id % 97)·100 (spread 9,600 — well inside the
    // delay, so originals are never late); planted ANCIENT re-crawls (ts =
    // 1,000 — always below any advanced watermark, so quarantined in
    // every batch after the first) and WITHIN-DELAY re-crawls (ts =
    // 1,005,000, inside the 50,000 delay of the global max — always
    // processed, then blocked by the store as ordinary duplicates).
    // The watermark is the Spark rule replayed exactly: max event
    // time over PRIOR batches minus the delay, advanced at batch
    // boundaries. ONE oracle equality gates the batch split, the
    // per-batch watermark sequence, the quarantine set, the store
    // semantics over on-time rows, and the commit attribution.
    "st17_stream_ingest_late" -> ((s, dir) => {
      import graft.sources.Versioned
      val key = (dir.hashCode.toLong & 0xffffffffL).toHexString
      val root = new java.io.File(
        graft.TempDirs.scratchRoot, s"graft-st17-${key}b")
        .getAbsolutePath
      if (!Versioned.hasVersion(root, 4)) {
        graft.TempDirs.registerCleanedAtExit(root)
        val base = graft.Tables.fanOut(graft.Tables(s, dir, "documents"))
        val off = (base.agg(max(col("doc_id"))).head().getLong(0)
          / 1000000L + 1L) * 1000000L
        val orig = base.select(col("doc_id"), col("source"),
          col("text"),
          (lit(1000000L) + (col("doc_id") % 97) * 100L).as("ts"))
        val ancient = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + off).as("doc_id"), col("source"),
            col("text"), lit(1000L).as("ts"))
        val within = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2 * off).as("doc_id"), col("source"),
            col("text"), lit(1005000L).as("ts"))
        val scored = orig.unionByName(ancient).unionByName(within)
          .select(col("doc_id"), col("source"),
            graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
            graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
              .as("n_tokens"),
            round(graft.ops.TextAnalysis.qualityScoreOf(
              graft.ops.TextAnalysis.tokens(lower(col("text"))),
              col("text")), 6).as("q"),
            col("ts"))
        Streams.corpusIngestDrain(scored, root, numBatches = 4,
          eventTime = Some(("ts", 50000L)))
      }
      Streams.corpusWithLate(s, root).orderBy("doc_id")
    }),

    // stream-driven incremental MV (q89's delta algebra applied per
    // micro-batch commit off st14's manifest-log stream, version-keyed
    // idempotent sink): the final MV state after draining all commits
    // must equal a direct recompute of the final snapshot — which is
    // exactly what the oracle computes. Per-version MV == full
    // recompute at EVERY version and re-run idempotence are
    // StreamsSpec-gated.
    "st15_streaming_mv" -> ((s, dir) => {
      val root = streamSinkRoot(s, dir)
      Streams.streamingMvDrain(s, root, "o_orderkey",
          "o_orderstatus", "o_totalprice")
        .orderBy("o_orderstatus")
    }),

    "st12_transform_with_state" -> ((s, dir) => {
      val ev = RelQueries.events(s, dir).select("user_id", "value")
      Streams.transformWithStateDrain(ev)
        .select(col("user_id"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy("user_id")
    }),

    // stream-stream LEFT OUTER join: st04's correlation with
    // null-extension for clicks that never convert — unmatched rows
    // can only be emitted once the watermark proves no future match,
    // so a sentinel flush drives the final watermark over every real
    // row (see Streams.streamLeftJoinDrain). Oracle: batch left-join
    // replay — streaming == batch including the null-extended rows.
    "st08_stream_left_join" -> ((s, dir) => {
      val ev = RelQueries.events(s, dir)
        .select("user_id", "event_type", "ts", "value")
      Streams.streamLeftJoinDrain(ev, windowMs = 30 * 60 * 1000L)
        .groupBy(col("c_user").as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("p_user").isNull, 1L).otherwise(0L))
            .as("n_unmatched"),
          round(sum(coalesce(col("p_value"), lit(0.0))), 4)
            .as("purchase_value"))
        .orderBy("user_id")
    })
  )

  private val oracles0: Map[String, String] = Map(
    // latest row per key: window argmax on (micro-truncated ts, id) —
    // the same total order the engine's struct max applies
    "st05_stream_upsert" -> """
      SELECT user_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
             event_id, event_type, ROUND(value, 4) AS value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id""",

    "st01_stream_hourly" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    // the same hour windows, ranked by ROW_NUMBER on the identical
    // (rounded value DESC, event_id) rule the heap aggregate applies
    "st11_stream_topk" -> """
      WITH r AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS hour,
               event_id, value,
               ROW_NUMBER() OVER (
                 PARTITION BY date_trunc('hour', ts)
                 ORDER BY ROUND(value, 4) DESC, event_id) AS rank
        FROM events)
      SELECT hour, rank, event_id, ROUND(value, 4) AS value
      FROM r WHERE rank <= 3 ORDER BY hour, rank""",

    // the lifetime totals the stateful processor accumulated across
    // micro-batches must equal the one-shot batch aggregation
    // the one-shot merge replay grouped by status: batch boundaries
    // must be invisible in the final table
    "st13_stream_versioned_sink" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
                 AS o_totalprice,
               CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 31 = 0 OR o_orderkey % 37 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT (MAX(o_orderkey) // 10000000 + 1)
                             * 10000000 FROM base), 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 41 = 0),
      v2 AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(o_totalprice), 2) AS total
      FROM v2 GROUP BY 1 ORDER BY 1""",

    // the streamed-out feed aggregated by change type: key-disjoint
    // micro-batches make the union of per-commit feeds equal the net
    // diff — the q87 feed replay (delete %37 pre-image, update
    // pre/post pair for %31-not-%37, insert %41 at the derived offset)
    "st14_cdc_read" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice FROM orders),
      off AS (
        SELECT (MAX(o_orderkey) // 10000000 + 1) * 10000000 AS v
        FROM base),
      feed AS (
        SELECT 'delete' AS _change_type, o_orderkey AS k,
               o_totalprice AS p
        FROM base WHERE o_orderkey % 37 = 0
        UNION ALL
        SELECT 'update_preimage', o_orderkey, o_totalprice
        FROM base WHERE o_orderkey % 31 = 0 AND o_orderkey % 37 <> 0
        UNION ALL
        SELECT 'update_postimage', o_orderkey,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
        FROM base WHERE o_orderkey % 31 = 0 AND o_orderkey % 37 <> 0
        UNION ALL
        SELECT 'insert', o_orderkey + off.v, 1.0
        FROM base, off WHERE o_orderkey % 41 = 0)
      SELECT _change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(FLOOR(p * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM feed GROUP BY 1 ORDER BY _change_type""",

    // the ingest replay: md5 batch split (the d23 hashUniform pattern,
    // salt 'ingest'), per-(fp, batch) min-id canonicals, winner =
    // first batch's canonical that passes the gate, commit = batch+1
    "st16_stream_ingest" -> """
      WITH off AS (
        SELECT (MAX(doc_id) // 1000000 + 1) * 1000000 AS o
        FROM documents),
      corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + (SELECT o FROM off), source, text
        FROM documents WHERE doc_id % 10 = 0),
      f0 AS (
        SELECT doc_id, source, text,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(lower(trim(text)), '\s+')
               END AS ltoks
        FROM corpus),
      qc AS (
        SELECT doc_id, source, fp,
               CAST(len(ltoks) AS BIGINT) AS n_tokens,
               CASE WHEN len(ltoks) = 0 THEN 0.0
                    ELSE len(list_filter(ltoks, t -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','are',
                       'was','it','that','for','on','with','as'], t)))
                      * 1.0 / len(ltoks) END AS sw,
               CASE WHEN len(ltoks) = 0 THEN 0.0
                    ELSE 1.0 - len(list_distinct(ltoks)) * 1.0 / len(ltoks)
                    END AS rep,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE len(regexp_extract_all(text, '[^\p{L}\p{N}\s]'))
                         * 1.0 / length(text) END AS punct,
               LEAST(len(ltoks) / 100.0, 1.0) AS lenscore
        FROM f0),
      q AS (
        SELECT doc_id, source, fp, n_tokens,
               ROUND(0.25 * LEAST(sw * 4.0, 1.0) + 0.25 * (1.0 - rep)
                     + 0.25 * lenscore
                     + 0.25 * (1.0 - LEAST(punct * 4.0, 1.0)), 6) AS q
        FROM qc),
      bt AS (
        SELECT q.*, CAST(floor(
          CAST(list_sum(list_transform(range(1, 9), i ->
            (strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR) || 'ingest'),
                 CAST(i AS INT), 1)) - 1)
            * power(16, 8 - i))) AS DOUBLE) / 4294967296.0 * 4)
          AS INT) AS bid
        FROM q),
      canon AS (
        SELECT bt.* FROM bt JOIN (
          SELECT MIN(doc_id) AS doc_id FROM bt GROUP BY fp, bid) m
          ON bt.doc_id = m.doc_id),
      acc AS (SELECT * FROM canon WHERE q >= 0.5),
      win AS (
        SELECT * FROM (
          SELECT acc.*, ROW_NUMBER() OVER (PARTITION BY fp
            ORDER BY bid, doc_id) AS rn FROM acc)
        WHERE rn = 1)
      SELECT doc_id, source, n_tokens, q, bid + 1 AS commit_v
      FROM win ORDER BY doc_id""",

    // the event-time replay (st17): st16's rule restricted to ON-TIME
    // rows, where late(d) = bid > 0 AND ts < max(prior-batch ts) -
    // 50000 — the engine's per-batch high-water sequence computed
    // declaratively; late rows come back as the quarantine arm
    "st17_stream_ingest_late" -> """
      WITH off AS (
        SELECT (MAX(doc_id) // 1000000 + 1) * 1000000 AS o
        FROM documents),
      corpus AS (
        SELECT doc_id, source, text,
               1000000 + (doc_id % 97) * 100 AS ts
        FROM documents
        UNION ALL
        SELECT doc_id + (SELECT o FROM off), source, text, 1000
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2 * (SELECT o FROM off), source, text, 1005000
        FROM documents WHERE doc_id % 10 = 0),
      f0 AS (
        SELECT doc_id, source, text, ts,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(lower(trim(text)), '\s+')
               END AS ltoks
        FROM corpus),
      qc AS (
        SELECT doc_id, source, fp, ts,
               CAST(len(ltoks) AS BIGINT) AS n_tokens,
               CASE WHEN len(ltoks) = 0 THEN 0.0
                    ELSE len(list_filter(ltoks, t -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','are',
                       'was','it','that','for','on','with','as'], t)))
                      * 1.0 / len(ltoks) END AS sw,
               CASE WHEN len(ltoks) = 0 THEN 0.0
                    ELSE 1.0 - len(list_distinct(ltoks)) * 1.0 / len(ltoks)
                    END AS rep,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE len(regexp_extract_all(text, '[^\p{L}\p{N}\s]'))
                         * 1.0 / length(text) END AS punct,
               LEAST(len(ltoks) / 100.0, 1.0) AS lenscore
        FROM f0),
      q AS (
        SELECT doc_id, source, fp, ts, n_tokens,
               ROUND(0.25 * LEAST(sw * 4.0, 1.0) + 0.25 * (1.0 - rep)
                     + 0.25 * lenscore
                     + 0.25 * (1.0 - LEAST(punct * 4.0, 1.0)), 6) AS q
        FROM qc),
      bt AS (
        SELECT q.*, CAST(floor(
          CAST(list_sum(list_transform(range(1, 9), i ->
            (strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR) || 'ingest'),
                 CAST(i AS INT), 1)) - 1)
            * power(16, 8 - i))) AS DOUBLE) / 4294967296.0 * 4)
          AS INT) AS bid
        FROM q),
      mx AS (SELECT bid, MAX(ts) AS mx FROM bt GROUP BY bid),
      wm AS (
        SELECT b.bid, MAX(m.mx) - 50000 AS wm
        FROM (SELECT DISTINCT bid FROM bt) b
        JOIN mx m ON m.bid < b.bid
        GROUP BY b.bid),
      flags AS (
        SELECT bt.*, CASE WHEN w.wm IS NOT NULL AND bt.ts < w.wm
                          THEN 1 ELSE 0 END AS late
        FROM bt LEFT JOIN wm w ON w.bid = bt.bid),
      ot AS (SELECT * FROM flags WHERE late = 0),
      canon AS (
        SELECT ot.* FROM ot JOIN (
          SELECT MIN(doc_id) AS doc_id FROM ot GROUP BY fp, bid) m
          ON ot.doc_id = m.doc_id),
      acc AS (SELECT * FROM canon WHERE q >= 0.5),
      win AS (
        SELECT * FROM (
          SELECT acc.*, ROW_NUMBER() OVER (PARTITION BY fp
            ORDER BY bid, doc_id) AS rn FROM acc)
        WHERE rn = 1)
      SELECT doc_id, source, n_tokens, q, bid + 1 AS commit_v,
             'committed' AS status
      FROM win
      UNION ALL
      SELECT doc_id, source, n_tokens, q, bid + 1, 'late'
      FROM flags WHERE late = 1
      ORDER BY doc_id""",

    // final-snapshot recompute (st13's v2 replay, MV columns): the
    // streamed MV must land exactly here after its per-commit deltas
    "st15_streaming_mv" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      ch AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100
                 AS o_totalprice,
               CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op
        FROM base WHERE o_orderkey % 31 = 0 OR o_orderkey % 37 = 0
        UNION ALL
        SELECT o_orderkey + (SELECT (MAX(o_orderkey) // 10000000 + 1)
                             * 10000000 FROM base), 'N', 1.0, 'U'
        FROM base WHERE o_orderkey % 41 = 0),
      v2 AS (
        SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN c.op = 'U' THEN c.o_orderstatus
                    ELSE b.o_orderstatus END AS o_orderstatus,
               CASE WHEN c.op = 'U' THEN c.o_totalprice
                    ELSE b.o_totalprice END AS o_totalprice
        FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op = 'U')
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents
      FROM v2 GROUP BY 1 ORDER BY o_orderstatus""",

    "st12_transform_with_state" -> """
      SELECT user_id, COUNT(*) AS n_events,
             ROUND(SUM(value), 4) AS sum_value
      FROM events GROUP BY user_id ORDER BY user_id""",

    // gap-and-island sessionization: a session starts where the gap to
    // the previous event exceeds 30 min (epoch_ms matches the engine's
    // millisecond state-machine arithmetic)
    "st02_sessions" -> """
      WITH m AS (
        SELECT user_id, value,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      IS NULL
                    OR epoch_ms(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_ms(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts) > 1800000
                    THEN 1 ELSE 0 END AS brk
        FROM events)
      SELECT user_id, CAST(SUM(brk) AS BIGINT) AS n_sessions,
             COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
      FROM m WHERE user_id < 50
      GROUP BY user_id ORDER BY user_id""",

    // the tripled redelivery collapses back to exactly the original
    // event set (copies are identical full rows, so "first wins" is
    // value-indistinguishable)
    "st03_stream_dedup" -> """
      SELECT event_id, user_id, event_type, ROUND(value, 4) AS value
      FROM events ORDER BY event_id""",

    // batch replay of the stream-stream range join; epoch_us matches
    // the engine's nanos->micros timestamp truncation
    "st04_stream_join" -> """
      WITH c AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value
        FROM events WHERE event_type = 'purchase')
      SELECT c.user_id, COUNT(*) AS n_pairs,
             ROUND(SUM(p.value), 4) AS purchase_value
      FROM c JOIN p ON c.user_id = p.user_id
        AND c.tus >= p.tus AND c.tus <= p.tus + 1800000000
      GROUP BY c.user_id ORDER BY c.user_id""",

    // batch replay of the stream-static enrichment join
    "st06_stream_static" -> """
      SELECT n.n_name AS nation, c.c_mktsegment AS segment,
             COUNT(*) AS n_events, ROUND(SUM(e.value), 4) AS sum_value
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2 ORDER BY nation, segment""",

    // same epoch-aligned sliding-window enumeration as batch q42
    "st07_stream_sliding" -> """
      WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_type, value
        FROM events),
      x AS (
        SELECT tus - (tus % 900000000) - 900000000 * k.k AS ws,
               event_type, value
        FROM e, (SELECT unnest(generate_series(0, 3)) AS k) k)
      SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS w_start,
             event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      FROM x GROUP BY 1, 2 ORDER BY w_start, event_type""",

    // session-grain gap-and-island replay. Two deliberate deltas vs
    // q52/st02's state-machine semantics: session_window windows are
    // half-open, so the break fires at gap >= 30min (not >) and is
    // decided at MICROsecond precision; and end = last event + gap,
    // so dur_ms carries the trailing gap (+1800000; exact because the
    // gap is a whole number of ms).
    "st09_session_window" -> """
      WITH m AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                      - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY ts)
                      >= 1800000000 THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT user_id, tus // 1000 AS tms, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY tus
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM m)
      SELECT user_id,
             strftime(make_timestamp(MIN(tms) * 1000),
               '%Y-%m-%d %H:%M:%S') AS s_start,
             MAX(tms) - MIN(tms) + 1800000 AS dur_ms,
             COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
      FROM g WHERE user_id < 50
      GROUP BY user_id, sid
      ORDER BY user_id, s_start""",

    // batch replay of the stream-stream LEFT OUTER range join
    "st08_stream_left_join" -> """
      WITH c AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT user_id AS pu, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
               value
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT c.user_id, p.pu, p.value
        FROM c LEFT JOIN p ON c.user_id = p.pu
          AND c.tus >= p.tus AND c.tus <= p.tus + 1800000000)
      SELECT user_id, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN pu IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unmatched,
             ROUND(SUM(COALESCE(value, 0.0)), 4) AS purchase_value
      FROM j GROUP BY user_id ORDER BY user_id"""
  )

  /** st18's oracle IS st16's, verbatim: store compaction must be
    * semantics-neutral, so the compaction-forced drain hash-matches
    * the identical replay — the neutrality claim under the driver's
    * own gate, not just the spec suite's.
    */
  val oracles: Map[String, String] = oracles0 +
    ("st18_stream_ingest_compacted" -> oracles0("st16_stream_ingest"))
}
