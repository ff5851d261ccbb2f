package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT percentiles (linear interpolation, the
  * quantile_cont / R type-7 definition) without the scale trap in
  * Spark's built-in `percentile` aggregate: that one buffers every
  * value of a group in a single aggregation buffer, so a hot group =
  * one reducer holding the whole group in memory — unusable when a
  * group spans terabytes.
  *
  * Plan here: parallelism follows PARTITIONS, not groups.
  *   1. range-repartition by (group, value) + in-partition sort — the
  *      same parallel machinery as a global ORDER BY (range partitioner
  *      samples boundaries, so even a single giant group spreads over
  *      many partitions);
  *   2. pass 1 (metadata-light): per-partition per-group run counts →
  *      tiny driver table of partition offsets + group sizes;
  *   3. pass 2: each partition knows the global 0-based index of every
  *      row it holds (offset + local position) and emits ONLY the rows
  *      sitting at a requested floor/ceil rank — a handful per group.
  *   Interpolation happens on the driver over (groups x percentiles x 2)
  *   values. The ranged data is persisted (memory-then-disk) between
  *   the two passes — one materialized shuffle, like any sort — and
  *   unpersisted before returning.
  *
  * RDD mapPartitions is used deliberately (genuine per-partition
  * imperative logic: running indices against precomputed offsets).
  */
object Percentiles {

  /** Exact interpolated percentiles of `valCol` per `groupCol`.
    * `ps` maps output column name -> fraction in [0,1]; nulls in
    * `valCol` are ignored (quantile_cont semantics). Output: one row
    * per group, columns (groupCol, ps.keys...), driver-built (group
    * domains are report-sized; the DATA never lands on the driver).
    */
  def exact(df: DataFrame, groupCol: String, valCol: String,
            ps: Seq[(String, Double)], parts: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 })
    val spark = df.sparkSession
    val n = if (parts > 0) parts
      else spark.sessionState.conf.numShufflePartitions
    val data = df
      .select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ranged = data.repartitionByRange(n, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = runCounts(ranged.rdd)
      // group sizes and, per partition, the global index of its first
      // row of each group
      val sizes: Map[String, Long] =
        counts.groupBy(_._2).map { case (g, cs) => g -> cs.map(_._3).sum }
      val offsets: Map[(Int, String), Long] = {
        val byGroup = counts.groupBy(_._2)
        byGroup.flatMap { case (g, cs) =>
          var run = 0L
          cs.sortBy(_._1).map { case (pid, _, c) =>
            val o = run; run += c; ((pid, g), o)
          }
        }
      }
      // ranks wanted per group: floor and ceil of (n-1)*p, 0-based
      val wanted: Map[String, Set[Long]] = sizes.map { case (g, sz) =>
        g -> ps.flatMap { case (_, p) =>
          val rank = p * (sz - 1)
          Seq(math.floor(rank).toLong, math.ceil(rank).toLong)
        }.toSet
      }
      val bcOffsets = spark.sparkContext.broadcast(offsets)
      val bcWanted = spark.sparkContext.broadcast(wanted)
      // pass 2: emit only rows at wanted global ranks
      val picked: Map[(String, Long), Double] = ranged.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val off = bcOffsets.value
          val want = bcWanted.value
          var cur: String = null
          var idx = 0L
          it.flatMap { r =>
            val g = r.getString(0)
            if (g != cur) { cur = g; idx = off((pid, g)) } else idx += 1L
            if (want(g)(idx)) Iterator(((g, idx), r.getDouble(1)))
            else Iterator.empty
          }
        }.collect().toMap
      val rows = sizes.keys.toSeq.sorted.map { g =>
        val vals = ps.map { case (_, p) =>
          val rank = p * (sizes(g) - 1)
          val lo = picked((g, math.floor(rank).toLong))
          val hi = picked((g, math.ceil(rank).toLong))
          val frac = rank - math.floor(rank)
          lo + frac * (hi - lo)
        }
        Row.fromSeq(g +: vals)
      }
      val schema = StructType(
        StructField(groupCol, StringType) +:
          ps.map { case (name, _) => StructField(name, DoubleType) })
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    } finally ranged.unpersist(blocking = false)
  }

  /** Pass 1: (partition, group) -> row count over the RANGE-partitioned
    * sorted data. The collect is O(groups + partitions), NOT
    * O(groups x partitions): range partitioning by (g, v) makes every
    * group's rows contiguous across the partition sequence, so the
    * total number of (pid, group) runs is (#groups) plus at most one
    * extra run per partition boundary a group straddles — bounded by
    * #groups + #partitions regardless of cardinality (asserted by
    * PercentilesSpec's high-cardinality case). Driver memory is
    * therefore proportional to the OUTPUT (one row per group) — the
    * floor for any per-group report — plus the partition count, never
    * to their product.
    */
  private[graft] def runCounts(
      ranged: org.apache.spark.rdd.RDD[Row]): Array[(Int, String, Long)] =
    ranged.mapPartitionsWithIndex { (pid, it) =>
      // groups are contiguous within a sorted partition, so this is a
      // streaming run count — per-task state is one (group, count)
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r =>
        val g = r.getString(0)
        acc.update(g, acc.getOrElse(g, 0L) + 1L)
      }
      acc.iterator.map { case (g, c) => (pid, g, c) }
    }.collect()
}
