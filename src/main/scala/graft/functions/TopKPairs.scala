package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
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
  * emitted score keeps full precision. `aux` is an opaque long payload
  * carried per entry (e.g. the neighbor's label in hard-negative
  * mining; pass 0 when unused). Ties at the k boundary resolve
  * exactly as the window formulation did (id tie-break), so the kept
  * SET is identical. Output: array<struct<nbr_id, score, aux>>
  * best-first; null sortKey/id inputs are skipped; an empty group
  * evals to null.
  */
case class TopKPairs(sortKey: Expression, id: Expression,
                     value: Expression, aux: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Double, Long)]] {

  require(k > 0, s"graft_topk needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(sortKey, id, value, aux)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("nbr_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("aux", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (sortKey.dataType, id.dataType, value.dataType, aux.dataType) match {
      case (DoubleType, LongType, DoubleType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint, double, bigint), got $t")
    }

  /** Worst entry dequeues first: lower sortKey is worse; on ties the
    * LARGER id is worse (ranking is id-ascending).
    */
  private val worstFirst: Ordering[(Double, Long, Double, Long)] =
    new Ordering[(Double, Long, Double, Long)] {
      def compare(a: (Double, Long, Double, Long),
                  b: (Double, Long, Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Long, Double, Long)],
                   item: (Double, Long, Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(item)
    else if (worstFirst.compare(item, buf.head) < 0) {
      // ranks strictly better than the current worst: swap it in
      buf.dequeue(); buf.enqueue(item)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long, Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long, Double, Long)] = {
    val s = sortKey.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val v = value.eval(input)
      val raw = if (v == null) s.asInstanceOf[Double]
                else v.asInstanceOf[Double]
      val a = aux.eval(input)
      val al = if (a == null) 0L else a.asInstanceOf[Long]
      push(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long], raw, al))
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long, Double, Long)],
                     b2: mutable.PriorityQueue[(Double, Long, Double, Long)]): mutable.PriorityQueue[(Double, Long, Double, Long)] = {
    b2.foreach(push(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long, Double, Long)]): Any =
    if (buf.isEmpty) null
    else {
      // best-first: best entries rank SMALLEST under worstFirst
      // (ascending sort = best first)
      val sorted = buf.toArray.sorted(worstFirst)
      new GenericArrayData(sorted.map { case (_, i, raw, a) =>
        new GenericInternalRow(Array[Any](i, raw, a))
      }.asInstanceOf[Array[Any]])
    }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long, Double, Long)]): Array[Byte] = {
    val items = buf.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + items.length * 32)
    bb.putInt(items.length)
    items.foreach { case (s, i, v, a) =>
      bb.putDouble(s); bb.putLong(i); bb.putDouble(v); bb.putLong(a)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      buf.enqueue((bb.getDouble(), bb.getLong(), bb.getDouble(), bb.getLong()))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(sortKey = newChildren(0), id = newChildren(1),
      value = newChildren(2), aux = newChildren(3))
}

object TopKPairs {
  /** Register once per session. k must arrive as a foldable literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKPairs(exprs(0), exprs(1), exprs(2),
        exprs(3), exprs(4).eval().asInstanceOf[Number].intValue()),
      "scala_udf")

  /** array<struct<nbr_id, score, aux>> of the k entries with the
    * highest (sortKey, -id); pass the ROUNDED score as sortKey, the
    * raw score as value, and any per-entry long payload as aux.
    */
  def topK(sortKey: Column, id: Column, value: Column, k: Int,
           aux: Column = lit(0L)): Column =
    call_function("graft_topk", sortKey, id, value, aux, lit(k))
}
