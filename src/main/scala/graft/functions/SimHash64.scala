package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array as a native Catalyst Expression
  * (SURVEY.md §2.8 beyond-reference surface; Charikar 2002 random
  * hyperplane sketch specialized to token sets).
  *
  * Per token, a deterministic 64-bit hash votes +-1 on each bit; the
  * sign of each bit's vote total forms the signature. Near-duplicate
  * texts differ in few bits, so candidate pairs fall out of Hamming
  * distance (`bit_count(a ^ b)` with builtin functions).
  *
  * Implemented as an Expression (not a Scala UDF) so it runs inside the
  * operator without SerDe per row. Codegen calls [[compute]] through a
  * reference object: the token/md5 loop itself isn't worth inlining,
  * but the call keeps the surrounding projection inside its
  * WholeStageCodegen span (a CodegenFallback node would force the whole
  * stage into interpreted mode).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $t")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.get(i, StringType).asInstanceOf[UTF8String].toString
        val h = SimHash64.hash64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def compute(input: Any): Long = nullSafeEval(input).asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Deterministic 64-bit token hash: first 8 md5 bytes, big-endian —
    * i.e. the value of the first 16 hex digits of `md5(t)`. md5 has the
    * same definition in every engine (unlike the previous seeded
    * murmur pair), so the d08 oracle replays signatures, band keys and
    * Hamming distances bit-for-bit in DuckDB; bit b (LSB-first) is bit
    * (b mod 32) of the hex-digit group chars 9-16 (b < 32) / 1-8
    * (b >= 32).
    */
  def hash64(t: String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(h, 0, 8).getLong
  }

  /** Register once per session, then use via [[simhash64]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
}
