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
}
