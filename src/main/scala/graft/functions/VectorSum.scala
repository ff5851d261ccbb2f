package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum over an `array<double>` column as a native
  * aggregate (SURVEY.md §2.8 beyond-reference surface).
  *
  * Spark has no built-in vector-sum aggregate, so the composable plan
  * for an embedding centroid is `posexplode` + `groupBy(key, dim)` —
  * a dim× row amplification (64× here) through the shuffle, plus a
  * second shuffle to reassemble the vector. This aggregate keeps one
  * double[] buffer per group per task, partial-aggregates map-side
  * like any built-in sum, and moves exactly one array per (group ×
  * task) through the shuffle: the same O(groups · dim) state a native
  * engine's SIMD accumulator would hold.
  *
  * Mixed dimensions: the buffer grows to the longest input seen and
  * shorter vectors are treated as zero-padded, so extra tail
  * components are genuinely kept (an empty first input can no longer
  * zero out a group); embeddings pipelines have a fixed dim, so this
  * never triggers there, and it keeps the aggregate total (never
  * throws mid-task). Serialization length-prefixes the buffer so a
  * legitimate zero-length sum survives a shuffle distinct from the
  * no-input null buffer.
  */
case class VectorSum(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_vecsum requires array<double>, got $t")
    }

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double],
                      input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (buffer == null) arr.toDoubleArray()
      else {
        val m = arr.numElements()
        val out = if (m > buffer.length)
          java.util.Arrays.copyOf(buffer, m) else buffer
        var i = 0
        while (i < m) { out(i) += arr.getDouble(i); i += 1 }
        out
      }
    }
  }

  override def merge(b1: Array[Double],
                     b2: Array[Double]): Array[Double] =
    if (b1 == null) b2
    else if (b2 == null) b1
    else {
      val (long, short) =
        if (b1.length >= b2.length) (b1, b2) else (b2, b1)
      var i = 0
      while (i < short.length) { long(i) += short(i); i += 1 }
      long
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  // length-prefixed: a zero-length buffer (all-empty-array group) is a
  // real sum and must round-trip distinct from the null (no-input)
  // buffer, which serializes to zero bytes
  override def serialize(buffer: Array[Double]): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(4 + buffer.length * 8)
      bb.putInt(buffer.length)
      buffer.foreach(bb.putDouble)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bb.getInt())(bb.getDouble)
    }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VectorSum =
    copy(child = c)
}

object VectorSum {
  /** Register once per session (the analyzer wraps the
    * AggregateFunction in an AggregateExpression automatically).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vecsum", exprs => VectorSum(exprs.head), "scala_udf")

  def vecSum(v: Column): Column = call_function("graft_vecsum", v)
}
