package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational building blocks (SURVEY.md §2.3-2.6: F*, J*, A*, D*, U*).
  *
  * Every reference loop-over-groups (`Method_code.Rmd:188-204` etc.)
  * becomes one `groupBy` = one shuffle; every per-state filter inside a
  * loop (F3) disappears into the grouping key. Joins against small
  * (dimension-sized) sides are left to Catalyst/AQE, which picks
  * BroadcastHashJoin for anything under the broadcast threshold — the
  * `state`-keyed tables this mirrors are <=51 rows (SURVEY.md §2.4 note).
  */
object Relational {

  /** Grouped weighted mean: sum(y*w)/sum(w) per group, optionally scaled.
    * Reference A1/A2 (`Method_code.Rmd:188-204,437-452`). One shuffle on
    * the grouping keys; partial aggregation (map-side combine) is
    * Catalyst-automatic since sum/sum is algebraic.
    */
  def weightedMean(df: DataFrame, groupCols: Seq[String], y: Column,
                   w: Column, scale: Double = 1.0,
                   as: String = "wmean"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg((lit(scale) * sum(y * w) / sum(w)).as(as))

  /** Exact per-group rank of `valueCol` (1-based, ties split by
    * `idCol`) plus the group size — the building block for
    * ntile / percent_rank / cume_dist WITHOUT the per-group window
    * sort that serializes a dominant group at scale (same machinery
    * as TextAnalysis.perplexityBuckets):
    *
    *   1. aggregate the (group, value) DISTRIBUTION — compact when
    *      `valueCol` is bounded-cardinality (pass a rounded value) —
    *      and running-sum it per group (a window over the aggregated
    *      rows only);
    *   2. rank(row) = rows strictly below its value + its row_number
    *      within the (group, value) TIE GROUP.
    *
    * All integer arithmetic, so rank-derived statistics replay exactly
    * against native SQL window functions ordered by (value, id).
    * Adds columns `rank` and `n_group`.
    *
    * Null `valueCol` rows rank FIRST (their own tie group), matching
    * the row_number window this replaces (Spark ascending null
    * ordering): the join back onto the (group, value) distribution is
    * null-SAFE (`<=>`), which Spark still plans as a hash join, so a
    * null value is a regular distribution row, never a dropped one.
    */
  def scalableRank(df: DataFrame, groupCol: String, valueCol: String,
                   idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = df.groupBy(groupCol, valueCol).agg(count(lit(1)).as("c"))
    val wGrp = Window.partitionBy(groupCol).orderBy(valueCol)
    val cum = dist
      .withColumn("below", coalesce(sum(col("c")).over(
        wGrp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_group", sum(col("c")).over(
        Window.partitionBy(groupCol)))
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"),
        col("below"), col("n_group"))
    val wTie = Window.partitionBy(groupCol, valueCol).orderBy(idCol)
    df.join(cum, col(groupCol) <=> col("__g") &&
        col(valueCol) <=> col("__v"))
      .withColumn("rank", col("below") + row_number().over(wTie))
      .drop("__g", "__v", "below")
  }

  /** Incremental (delta) maintenance of an INNER-join materialized
    * view under append-only deltas — the join companion to q51's
    * incremental aggregate maintenance:
    *
    *   V' = V ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * where A/B are the OLD snapshots (the standard delta-rule
    * derivation: the new-join cross terms expand to exactly these
    * three, each delta row pairing once). At scale only the
    * delta-sided joins execute — work proportional to |Δ|, never a
    * recompute of A ⋈ B; with A/B bucketed on the key the delta
    * probes are co-located and the old view is append-only storage.
    */
  def incrementalJoin(view: DataFrame, aOld: DataFrame, aDelta: DataFrame,
                      bOld: DataFrame, bDelta: DataFrame,
                      key: String): DataFrame =
    view
      .unionByName(aDelta.join(bOld, Seq(key)))
      .unionByName(aOld.join(bDelta, Seq(key)))
      .unionByName(aDelta.join(bDelta, Seq(key)))

  /** Chained full outer join on a shared key (reference J1,
    * `Method_code.Rmd:466-469`: `reduce(full_join, by='state')`).
    * 51-vs-49-key asymmetry yields nulls, exactly as the reference.
    */
  def fullOuterChain(dfs: Seq[DataFrame], key: String): DataFrame =
    dfs.reduce(_.join(_, Seq(key), "full_outer"))

  /** UNION ALL by column name (reference U1/U2, rbind). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_.unionByName(_))

  /** Distinct sorted key list (reference D1, `sort(unique(df$state))`).
    * Collecting is only legal for dimension-sized key domains (the
    * reference's 51 states); never call on a high-cardinality key.
    */
  def distinctSorted(df: DataFrame, key: String): Seq[String] =
    df.select(key).distinct().orderBy(key).collect().map(_.getString(0)).toSeq

  /** Global deviation summaries between an estimate and a truth column
    * (reference A4, `Method_code.Rmd:479-508`): ASD = mean squared
    * deviation, RASD = sqrt(ASD), AAD = mean absolute deviation. Nulls
    * (unmatched full-outer rows) are skipped natively by Spark aggs,
    * mirroring the reference's `na.rm=TRUE`.
    */
  def deviationSummary(df: DataFrame, est: Column, truth: Column): DataFrame =
    df.agg(
      avg(pow(est - truth, 2)).as("asd"),
      sqrt(avg(pow(est - truth, 2))).as("rasd"),
      avg(abs(est - truth)).as("aad"))

  /** Product aggregate in log space (reference A11,
    * `Method_code.Rmd:254-256` multiplies raw probabilities — underflows;
    * SURVEY.md Q3 mandates log space). Requires strictly positive inputs.
    */
  def productAgg(x: Column): Column = exp(sum(log(x)))

  /** As-of join (beyond-reference operator, J5): attach to every left
    * row the most recent right-side value at-or-before its timestamp,
    * per key. The classic time-series enrichment (trades←quotes,
    * events←latest-config) that naive SQL expresses as an O(n^2) range
    * self-join.
    *
    * Scale shape: union both sides (right rows carry only the value —
    * `unionByName(allowMissingColumns)` null-fills the rest), ONE
    * shuffle on the key, one in-partition sort on (ts, side, value),
    * then a running `last(ignoreNulls)` window — O(n log n) per key,
    * no range-join explosion, linear state. Right rows sort BEFORE
    * left rows at an equal timestamp (at-or-before semantics); equal-ts
    * right duplicates resolve to the greatest value (the `value` sort
    * key makes the pick deterministic under any partitioning).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightVal: Column,
               as: String = "asof_value"): DataFrame = {
    val r = right.select(col(keyCol), col(tsCol), rightVal.as("__rv"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val all = l.unionByName(r, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Long.MinValue, 0)
    all.withColumn(as, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }

  /** Skew-salted large-x-large join (beyond-reference operator, J6).
    * A plain shuffle join sends every row of a hot key to ONE reducer
    * partition — the straggler that idles the other 999 executors.
    * Salting splits each key over `saltFactor` sub-partitions: the
    * probe side gets a DETERMINISTIC salt from a whole-row xxhash64
    * fingerprint (never rand() — task retries must re-derive the same
    * salt or rows silently drop/duplicate), the build side is
    * replicated `saltFactor` times via explode, and the shuffle key
    * becomes (key, salt) — PlanSpec asserts the salt reaches
    * hashpartitioning.
    *
    * Complements AQE skew handling: AQE splits oversized sort-merge
    * partitions only after it observes map output sizes, and cannot
    * help the first aggregation over a skewed stream or a stateful
    * streaming join. Cost: build side x saltFactor — size saltFactor
    * to the observed hot-key multiplicity, not higher. Inner join
    * only: outer flavors over a replicated build would need a
    * dedup-of-null-matches pass.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    val salt = "__graft_salt"
    val p = probe.withColumn(salt,
      pmod(xxhash64(probe.columns.map(col): _*), lit(saltFactor))
        .cast("int"))
    val b = build.withColumn(salt,
      explode(array((0 until saltFactor).map(i => lit(i)): _*)))
    p.join(b, p(probeKey) === b(buildKey) && p(salt) === b(salt), "inner")
      .drop(salt)
  }

  /** Interval (stabbing) join via bin bucketing (beyond-reference
    * operator): match every (interval, point) pair with
    * start <= point <= end, as an EQUI-join. The naive SQL formulation
    * is a theta-join — Spark plans it as a broadcast-nested-loop or
    * cartesian product, O(N*M) at any scale. Here each interval
    * explodes into the fixed-width bins it covers, each point maps to
    * exactly ONE bin, and the bin equi-join + exact containment filter
    * produces each matching pair exactly once (in the point's bin) —
    * no dedup pass. Shuffle volume is intervals x avg-bins-covered +
    * points, both linear; `binWidth` should be on the order of the
    * typical interval length (cost = span/binWidth extra interval rows
    * vs more non-matching candidates per bin as binWidth grows).
    *
    * Inputs must share no column names; start/end/point are numeric
    * (callers convert dates to day numbers — monotonic, so BETWEEN is
    * preserved).
    */
  def intervalJoin(intervals: DataFrame, startCol: String, endCol: String,
                   points: DataFrame, pointCol: String,
                   binWidth: Long): DataFrame = {
    val bin = "__graft_bin"
    val iv = intervals.withColumn(bin,
      explode(sequence(floor(col(startCol) / binWidth),
        floor(col(endCol) / binWidth))))
    val pt = points.withColumn(bin, floor(col(pointCol) / binWidth))
    iv.join(pt, Seq(bin))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop(bin)
  }

  /** Batch MERGE / upsert (beyond-reference operator): apply a change
    * batch to a target snapshot in one pass — the relational core of
    * Delta/Iceberg `MERGE INTO`, usable on plain parquet. `changes`
    * carries the target's data columns plus `opCol` ('U' = upsert,
    * 'D' = delete): a matched 'U' replaces the target row, an
    * unmatched 'U' inserts, a 'D' removes, everything untouched
    * passes through.
    *
    * Scale shape: ONE full-outer shuffle join on the key — the
    * unavoidable minimum, since both unmatched sides survive (a
    * broadcast join can't produce build-side-unmatched rows). At
    * 100 TB the win is what this does NOT do: no per-row driver
    * logic, no second pass — table formats layer file-level pruning
    * (join only the files whose key ranges overlap the change batch)
    * on exactly this join. Requires at most one change row per key
    * (SQL MERGE's "multiple source rows match" error is the caller's
    * contract); duplicate keys would fan out the join.
    */
  def mergeUpsert(target: DataFrame, changes: DataFrame, keyCol: String,
                  opCol: String): DataFrame = {
    val dataCols = target.columns.toSeq
    val t = target.select(col(keyCol).as("__k"),
      struct(dataCols.map(col): _*).as("__t"))
    val c = changes.select(col(keyCol).as("__k"),
      struct(dataCols.map(col): _*).as("__c"), col(opCol).as("__op"))
    t.join(c, Seq("__k"), "full_outer")
      // target-only rows have null __op and pass through; 'D' rows
      // vanish whether matched (delete) or unmatched (no-op)
      .filter(col("__op").isNull || col("__op") === "U")
      .select(when(col("__op") === "U", col("__c")).otherwise(col("__t"))
        .as("__r"))
      .select("__r.*")
  }

  /** Slowly-changing-dimension type-2 history build (beyond-reference
    * operator): collapse an observation feed (key, ts, attributes...)
    * into validity intervals — one row per run of consecutive
    * identical attribute values, with `valid_from`/`valid_to`
    * (null = open), `version` and `is_current`. The warehouse pattern
    * for turning a CDC/snapshot feed into a point-in-time joinable
    * dimension.
    *
    * Scale shape: one shuffle on the key, then two window passes over
    * the SAME (key, ts) sort (change detection via lag, interval close
    * via lead) — Catalyst reuses the single sort, and per-key state is
    * one row, so a hot key costs a sort, never memory. Change
    * detection is null-safe (`<=>`): a null attribute is a value, not
    * a wildcard. The feed must be unique per (key, ts) — equal-ts
    * observations have no defined order; pre-aggregate them away (as
    * q48 does) before calling.
    */
  def scd2(feed: DataFrame, keyCol: String, tsCol: String,
           attrCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(tsCol)
    val attrs = struct(attrCols.map(col): _*)
    feed
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .drop("__prev")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** Sequential conversion funnel (the ClickHouse `windowFunnel`
    * semantics): a user reaches stage k when their events contain
    * stages(0) .. stages(k-1) as a strictly time-increasing
    * subsequence, taken greedily — t_1 = min ts of a stage-1 event,
    * t_k = min ts of a stage-k event with ts > t_(k-1). Returns
    * (stage_idx [1-based], n_users) with one row per stage reached by
    * at least one user.
    *
    * Scale shape: NO per-user event buffer anywhere — the obvious
    * `sort_array(collect_list)` fold holds a user's entire event
    * sequence in ONE aggregation buffer, which a single bot user with
    * 10^8 events turns into an executor OOM. Here each stage is a join
    * against the previous stage's (user, t) frame plus a grouped MIN:
    * aggregation state is one timestamp, partially aggregated
    * map-side, so a hot user costs their share of scan time and
    * nothing else. Every join and agg keys on the user column, so one
    * hash partitioning serves the whole chain (identical stage
    * subplans additionally collapse via exchange reuse); a user
    * reaching stage k appears in frames 1..k, so the final union +
    * count per stage_idx IS the cumulative reach count.
    *
    * Callers iterating multiple funnels over one slice should cache
    * `ev` — the chain scans it `stages.length` times.
    */
  def sequentialFunnel(ev: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val slice = ev.select(col(userCol).as("__fu"), col(typeCol).as("__fe"),
      col(tsCol).as("__ft"))
    var prev: DataFrame = null
    val frames = stages.zipWithIndex.map { case (st, i) =>
      val evk = slice.filter(col("__fe") === st)
      prev =
        if (i == 0) evk.groupBy("__fu").agg(min("__ft").as("__t"))
        else evk
          .join(prev.select(col("__fu"), col("__t").as("__tprev")), Seq("__fu"))
          .filter(col("__ft") > col("__tprev"))
          .groupBy("__fu").agg(min("__ft").as("__t"))
      prev.select(col("__fu"), lit(i + 1).as("stage_idx"))
    }
    frames.reduce(_.unionByName(_))
      .groupBy("stage_idx").agg(count(lit(1)).as("n_users"))
  }

  /** Table diff / reconciliation (beyond-reference operator): classify
    * every key across two snapshots as added / removed / changed /
    * unchanged — the migration-validation and CDC-audit primitive
    * ("did the backfill change anything it shouldn't have").
    *
    * ONE full-outer shuffle join on the key (the mergeUpsert shape);
    * value comparison is null-safe (`<=>` — a null is a value, not a
    * wildcard), so schema-evolved nullable columns diff correctly. At
    * 100 TB both sides shuffle once on the key and the row-level
    * verdict streams out of the join — no collect, no second pass;
    * callers aggregate the status column to whatever audit grain they
    * need.
    */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__n_$c")): _*)
    val oPresent = col(s"__o_${compareCols.head}")
    val nPresent = col(s"__n_${compareCols.head}")
    val someDiff = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    // presence is tracked by a literal marker, not the compare columns
    // (a compare column may be legitimately null on a present row)
    val om = o.withColumn("__o_present", lit(1))
    val nm = n.withColumn("__n_present", lit(1))
    om.join(nm, keys, "full_outer")
      .withColumn("status",
        when(col("__o_present").isNull, "added")
          .when(col("__n_present").isNull, "removed")
          .when(someDiff, "changed")
          .otherwise("unchanged"))
      .select(keys.map(col) :+ col("status") :+
        oPresent.as(s"old_${compareCols.head}") :+
        nPresent.as(s"new_${compareCols.head}"): _*)
  }
}
