package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto-front) query — the preference-query
  * operator class ("Integration of Skyline Queries into Spark SQL",
  * EDBT 2023): keep every row not dominated by another row, where b
  * dominates a iff b is <= a on every criterion and < on at least one
  * (max criteria are negated into min space).
  *
  * Scale shape — the canonical two-phase plan:
  *   1. LOCAL skyline per partition (`mapPartitions`, no shuffle):
  *      dominance pruning drops the overwhelming majority of rows for
  *      realistic (correlated) data.
  *   2. GLOBAL skyline over the surviving candidates on one task —
  *      legal because local survivors are a superset of the true
  *      skyline and typically tiny; anti-correlated worst cases where
  *      survivors stay large need a grid/angular repartitioning, which
  *      is out of scope here and flagged in the scaladoc.
  *
  * Output is a SET (dominance is partitioning-invariant): equal
  * criterion vectors never strictly dominate each other, so duplicates
  * on the criteria all survive — identical to the SQL NOT EXISTS
  * formulation the oracle runs.
  */
object Skyline {

  /** `a` strictly dominated by `b` in all-minimize space. */
  private def dominatedBy(a: Array[Double], b: Array[Double]): Boolean = {
    var allLe = true
    var anyLt = false
    var i = 0
    while (i < a.length && allLe) {
      if (b(i) > a(i)) allLe = false
      else if (b(i) < a(i)) anyLt = true
      i += 1
    }
    allLe && anyLt
  }

  /** In-memory skyline of one partition's rows (criteria pre-extracted
    * alongside the row): quadratic in the CANDIDATE list length, which
    * dominance pruning keeps small for realistic data.
    */
  private def localSkyline(
      it: Iterator[(Row, Array[Double])]): Iterator[(Row, Array[Double])] = {
    val window = scala.collection.mutable.ArrayBuffer.empty[(Row, Array[Double])]
    it.foreach { case (row, v) =>
      if (!window.exists { case (_, w) => dominatedBy(v, w) }) {
        val keep = window.filterNot { case (_, w) => dominatedBy(w, v) }
        window.clear()
        window ++= keep
        window += ((row, v))
      }
    }
    window.iterator
  }

  /** Skyline of `df` minimizing `minCols` and maximizing `maxCols`.
    *
    * Phase 1 local skylines are persisted and counted BEFORE the
    * single-task merge — two reasons: (a) a narrow `coalesce(1)` would
    * pull ALL upstream partitions into the one merged task and run
    * phase 1 serially (zero parallelism end-to-end); materializing
    * first keeps phase 1 parallel and ships only survivors. (b) the
    * count is the anti-correlation guard: if more than
    * `maxGlobalCandidates` rows survive local pruning (anti-correlated
    * data, where every row can be on the front), one grid-partitioned
    * pre-merge round runs first, and if survivors STILL exceed the
    * bound the operator fails loudly instead of silently serializing
    * an unbounded candidate set onto one core.
    */
  def skyline(df: DataFrame, minCols: Seq[String],
              maxCols: Seq[String],
              maxGlobalCandidates: Long = 2000000L): DataFrame = {
    val spark = df.sparkSession
    val crit = minCols.map(c => col(c).cast("double")) ++
      maxCols.map(c => -col(c).cast("double"))
    val n = minCols.length + maxCols.length
    require(n > 0, "skyline needs at least one criterion")
    val withV = df.withColumn("__crit", array(crit: _*))
    val local = withV.rdd
      .map { r =>
        val v = r.getSeq[Double](r.fieldIndex("__crit")).toArray
        (r, v)
      }
      .mapPartitions(localSkyline)            // phase 1: narrow, no shuffle
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val survivors = local.count()             // materializes phase 1 in parallel
    val merged =
      if (survivors <= maxGlobalCandidates) local
      else {
        // grid pre-merge: shuffle survivors into a bounded number of
        // partitions and prune within each (correct: local skylines
        // are always a superset of the global one)
        val pre = local.repartition(local.getNumPartitions.min(64))
          .mapPartitions(localSkyline)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val preCount = pre.count()
        local.unpersist(blocking = false)
        if (preCount > maxGlobalCandidates)
          throw new IllegalStateException(
            s"skyline: $preCount local-skyline survivors exceed the " +
              s"single-task merge bound $maxGlobalCandidates even after " +
              "a grid pre-merge (anti-correlated data); refusing to " +
              "serialize the merge — raise maxGlobalCandidates or " +
              "reduce the criteria space")
        pre
      }
    // shuffle=true so the merge task reads shuffled survivor blocks
    // rather than becoming a parent of every upstream partition
    val pruned = merged.coalesce(1, shuffle = true)
      .mapPartitions(localSkyline)            // phase 2: survivors only
      .map(_._1)
    spark.createDataFrame(pruned, withV.schema).drop("__crit")
  }
}
