package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection of two SORTED-ascending array<long> columns as one
  * merge scan — the per-edge kernel of adjacency-intersection triangle
  * counting ([[graft.ops.Graph.triangleCounts]]).
  *
  * `array_intersect` is semantically right but builds a fresh hash set
  * per ROW; on a graph query that is one set build + O(n+m) probes per
  * EDGE over O(sqrt m)-length neighbor lists. With both inputs already
  * sorted (they come from `sort_array(collect_list(...))`), the merge
  * scan does the same work in a branch-predictable two-pointer loop
  * with a single primitive buffer — no set, no boxing. Full codegen
  * ([[doGenCode]] emits the loop inline) so the surrounding projection
  * stays inside WholeStageCodegen.
  *
  * Caller contract: both arrays sorted ascending and null-free.
  * Duplicates are deduped exactly like `array_intersect` (each common
  * value appears once), so for sorted null-free inputs this expression
  * is a drop-in replacement — which is what makes
  * [[graft.RewriteSortedIntersect]] a semantics-preserving optimizer
  * rule. Unsorted input silently returns garbage — the rule only
  * fires on syntactic `sort_array(_, asc)` children.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect requires (array<long>, array<long>), " +
          s"got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    val buf = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var k = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        buf(k) = x; k += 1
        while (i < n && a.getLong(i) == x) i += 1
        while (j < m && b.getLong(j) == x) j += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val buf = ctx.freshName("buf")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long[] $buf = new long[java.lang.Math.min($n, $m)];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else {
         |    $buf[$k++] = $x;
         |    while ($i < $n && $a.getLong($i) == $x) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $x) { $j++; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersect =
    copy(left = l, right = r)
}

object SortedIntersect {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect",
      exprs => SortedIntersect(exprs(0), exprs(1)), "scala_udf")

  def intersectFast(a: Column, b: Column): Column =
    org.apache.spark.sql.functions
      .call_function("graft_sorted_intersect", a, b)
}
