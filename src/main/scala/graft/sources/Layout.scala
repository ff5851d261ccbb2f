package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the Z-order
  * clustering rewrite lakehouse engines ship as `OPTIMIZE ZORDER BY`
  * (public technique: Morton 1966 space-filling curves; used by
  * Delta/Iceberg/Hudi compaction). Beyond-reference sink surface next
  * to [[Compact]].
  *
  * Why it matters at 100 TB: parquet scan pruning works off per-file
  * min/max column statistics. A table sorted by ONE key yields tight
  * ranges for that key only — predicates on a second key still read
  * every file. Interleaving the bits of both keys and range-
  * partitioning on the interleaved value bounds EVERY file's extent
  * in BOTH dimensions (each halving of the file count alternates
  * between halving the x-extent and the y-extent), so either
  * predicate skips ~sqrt-proportionally many files.
  */
object Layout {

  /** 2-D Morton (Z-order) value: interleaves the low `bits` bits of
    * two non-negative integer columns, x in the even positions, y in
    * the odd. Pure integer arithmetic (shift/mask, codegen-friendly);
    * values above 2^bits must be range-reduced by the caller first
    * (e.g. `% (1 << bits)` or a rank transform) — high bits are
    * silently ignored here, which would collapse distant values onto
    * the same curve position.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1)
    }.reduce(_ + _)

  /** Rewrite `df` as `numFiles` parquet files clustered on the Z-curve
    * over `(xCol, yCol)`: range-partition on the interleaved value
    * (range, not hash — the curve ORDER is what bounds file extents),
    * sort within each partition, write. The z expression never
    * materializes as an output column.
    *
    * Scale shape: one range-exchange (sampled boundaries, AQE-
    * compatible) + partition-local sorts; no global sort, no driver
    * involvement. numFiles follows data volume — pair with
    * [[Compact]]'s advisory sizing when byte-targeting matters more
    * than file count.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  path: String, numFiles: Int,
                  bits: Int = 16): Unit = {
    val z = zValue(col(xCol), col(yCol), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
