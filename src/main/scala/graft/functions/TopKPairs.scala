package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a native aggregate (SURVEY.md §2.8
  * beyond-reference surface; the scale fix the round-6 verdict asked
  * for on s12's ranking stage).
  *
  * The composable alternative — `row_number().over(Window.partitionBy
  * (group).orderBy(...))` then `rank <= k` — shuffles EVERY scored
  * candidate row to its group's reducer and sorts them there: at
  * N-corpus × Q-query volume that is the whole scored cross product
  * through one shuffle. This aggregate keeps a k-bounded heap per
  * group per task, partial-aggregates map-side like any built-in agg
  * (each map task emits at most k entries per group), and merges heaps
  * log-k — the TakeOrdered shape, per group.
  *
  * Ordering is (sortKey DESC, id ASC) — the caller passes the
  * 6dp-ROUNDED score as `sortKey` (the float-portable ranking rule
  * used by every ANN ranking in [[graft.ops.Similarity]]) and the raw
  * score as `value`, so ranking stays cross-engine-stable while the
  * emitted score keeps full precision. Ties at the k boundary resolve
  * exactly as the window formulation did (id tie-break), so the kept
  * SET is identical. Output: array<struct<nbr_id, score>> best-first;
  * null sortKey/id inputs are skipped; an empty group evals to null.
  */
case class TopKPairs(sortKey: Expression, id: Expression,
                     value: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Double)]]
    with TernaryLike[Expression] {

  require(k > 0, s"graft_topk needs k > 0, got $k")

  override def first: Expression = sortKey
  override def second: Expression = id
  override def third: Expression = value

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("nbr_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (sortKey.dataType, id.dataType, value.dataType) match {
      case (DoubleType, LongType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint, double), got $t")
    }

  /** Worst entry dequeues first: lower sortKey is worse; on ties the
    * LARGER id is worse (ranking is id-ascending).
    */
  private val worstFirst: Ordering[(Double, Long, Double)] =
    new Ordering[(Double, Long, Double)] {
      def compare(a: (Double, Long, Double),
                  b: (Double, Long, Double)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Double)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Long, Double)],
                   item: (Double, Long, Double)): Unit = {
    if (buf.size < k) buf.enqueue(item)
    else if (worstFirst.compare(item, buf.head) < 0) {
      // ranks strictly better than the current worst: swap it in
      buf.dequeue(); buf.enqueue(item)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long, Double)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long, Double)] = {
    val s = sortKey.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val v = value.eval(input)
      val raw = if (v == null) s.asInstanceOf[Double]
                else v.asInstanceOf[Double]
      push(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long], raw))
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long, Double)],
                     b2: mutable.PriorityQueue[(Double, Long, Double)]): mutable.PriorityQueue[(Double, Long, Double)] = {
    b2.foreach(push(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long, Double)]): Any =
    if (buf.isEmpty) null
    else {
      // best-first: best entries rank SMALLEST under worstFirst
      // (ascending sort = best first)
      val sorted = buf.toArray.sorted(worstFirst)
      new GenericArrayData(sorted.map { case (_, i, raw) =>
        new GenericInternalRow(Array[Any](i, raw))
      }.asInstanceOf[Array[Any]])
    }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long, Double)]): Array[Byte] = {
    val items = buf.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + items.length * 24)
    bb.putInt(items.length)
    items.foreach { case (s, i, v) =>
      bb.putDouble(s); bb.putLong(i); bb.putDouble(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      buf.enqueue((bb.getDouble(), bb.getLong(), bb.getDouble()))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TopKPairs =
    copy(sortKey = f, id = s, value = t)
}

object TopKPairs {
  /** Register once per session. k must arrive as a foldable literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKPairs(exprs(0), exprs(1), exprs(2),
        exprs(3).eval().asInstanceOf[Number].intValue()), "scala_udf")

  /** array<struct<nbr_id, score>> of the k entries with the highest
    * (sortKey, -id); pass the ROUNDED score as sortKey and the raw
    * score as value.
    */
  def topK(sortKey: Column, id: Column, value: Column, k: Int): Column =
    call_function("graft_topk", sortKey, id, value, lit(k))
}
