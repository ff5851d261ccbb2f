package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL-replayable HyperLogLog (Flajolet–Fuchs–Gandouet–Meunier 2007)
  * with p = 12 (m = 4096 registers) over md5 draws.
  *
  * Why this exists next to q43's `hll_sketch_agg`: Spark's DataSketches
  * binaries are engine-specific, so q43 is rows-only by necessity. This
  * twin keeps the ALGORITHM — register index, leading-zero rank rho,
  * elementwise-max merge, harmonic-mean estimate — in a representation
  * an independent engine replays byte-exactly:
  *
  *  - register = first 3 md5 hex digits (12 bits) and rho = 1 + the
  *    leading-zero run of the next 15 hex digits (a 60-bit window):
  *    pure INTEGER domain, immune to float formatting and sum order.
  *  - the harmonic denominator sum(2^-rho) is held EXACT as a pair of
  *    BIGINT sums of 2^(61-rho) split at bit 32 (hi/lo halves — the
  *    unsplit sum of up to 4096 x 2^60 overflows a signed 64-bit
  *    accumulator). Integer addition is associative: no sum-order ulps.
  *  - the raw estimate alphaM2 / (S/2^61 + V) is then a FIXED tree of
  *    correctly-rounded IEEE ops over exactly-determined doubles
  *    (int64→double conversion and /2^61 scaling are exact or
  *    correctly rounded in both engines), so it gates UNROUNDED.
  *
  * The small-range (linear-counting) correction m·ln(m/V) crosses libm
  * and stays OUT of the gated surface; [[corrected]] provides it for
  * spec-level accuracy checks (SketchSpec gates the error bound), and
  * the gated summary carries V so any consumer can apply it.
  *
  * Scale shape: build is one map-side-combined groupBy over at most
  * m = 4096 registers per group key (a sketch per day/partition is KBs
  * of rows); merge is groupBy(register).max — the 100-TB rollup never
  * re-scans raw events, exactly q43's contract but in gateable form.
  */
object Hll {

  val P = 12
  val M = 4096
  /** Rank when the whole 60-bit window is zero (probability 2^-60). */
  val MaxRho = 61

  /** alpha_m * m^2 for m = 4096, the FFGM bias constant. Computed once
    * in double arithmetic here; the oracle side embeds the SAME double
    * as a 17-significant-digit literal (round-trip exact).
    */
  val AlphaM2: Double = 0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble

  /** 2^61 — exactly representable; the denominator's fixed-point scale. */
  val Scale: Double = 2.305843009213693952e18

  /** md5 hex draw for a key column (salted to decorrelate from the
    * repo's other md5 keyings).
    */
  def hexDraw(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(salt)))

  /** Register index: first 3 hex digits as a 12-bit integer. `conv`
    * (base-16 → base-10) is exact string→integer work, codegen'd.
    */
  def registerOf(hex: Column): Column =
    conv(substring(hex, 1, 3), 16, 10).cast("int")

  /** Rank rho over the 60-bit window (hex digits 4..18): 1 + leading
    * zero bits. The leading-zero count decomposes into whole zero hex
    * digits (via ltrim) plus the zero bits inside the first nonzero
    * digit (a 3-way CASE on its value) — no bit twiddling the two
    * dialects could disagree on.
    */
  def rhoOf(hex: Column): Column = {
    val t = ltrim(substring(hex, 4, 15), "0")
    val v = conv(substring(t, 1, 1), 16, 10).cast("int")
    val lzInDigit = when(v >= 8, 0).when(v >= 4, 1).when(v >= 2, 2)
      .otherwise(3)
    when(length(t) === 0, MaxRho)
      .otherwise(lit(4) * (lit(15) - length(t)) + lzInDigit + lit(1))
  }

  /** Per-group register table: groupCols, register INT, max_rho INT.
    * One shuffle, map-side combine, ≤ m rows per group.
    */
  def registers(df: DataFrame, key: Column, salt: String,
      groupCols: Seq[Column] = Seq.empty): DataFrame = {
    val h = hexDraw(key, salt)
    val drawn = df.select(groupCols :+ registerOf(h).as("register")
      :+ rhoOf(h).as("rho"): _*)
    drawn.groupBy(drawn.columns.dropRight(1).map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Sketch UNION: elementwise register max — associative, idempotent,
    * commutative, so any rollup of stored per-partition sketches is a
    * cheap grouped max over ≤ m-row inputs.
    */
  def merge(regs: DataFrame): DataFrame =
    regs.groupBy(col("register"))
      .agg(max(col("max_rho")).as("max_rho"))

  /** One-row gated summary of a merged register table:
    * (m, n_regs, v_zero, s_hi, s_lo, est_raw). s_hi/s_lo are the exact
    * bit-32 split of S = sum over PRESENT registers of 2^(61-rho);
    * absent registers (rho = 0, term 2^61) enter the estimate as the
    * exact double v_zero instead, keeping every integer path
    * overflow-free. est_raw is the uncorrected FFGM estimate.
    */
  def summary(merged: DataFrame): DataFrame = {
    val term = expr("shiftleft(cast(1 as bigint), 61 - max_rho)")
    val agg = merged.agg(
      count(lit(1)).as("n_regs"),
      sum(shiftright(term, 32)).as("s_hi"),
      sum(term.bitwiseAND(lit(4294967295L))).as("s_lo"))
    val vZero = lit(M.toLong) - col("n_regs")
    val denom = (col("s_hi").cast("double") * lit(4294967296.0) +
      col("s_lo").cast("double")) / lit(Scale) +
      vZero.cast("double")
    agg.select(lit(M).as("m"), col("n_regs"),
      vZero.as("v_zero"), col("s_hi"), col("s_lo"),
      (lit(AlphaM2) / denom + lit(0.0)).as("est_raw"))
  }

  /** Small-range-corrected estimate (spec surface, not gated: ln is
    * libm). Linear counting m·ln(m/V) when the raw estimate is under
    * 2.5m and zero registers remain, else the raw estimate.
    */
  def corrected(estRaw: Double, vZero: Long): Double =
    if (estRaw <= 2.5 * M && vZero > 0) M * math.log(M.toDouble / vZero)
    else estRaw
}
