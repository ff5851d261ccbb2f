package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, ExpressionInfo, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.{DotProduct, MatVecDots, SimHash64, SortedIntersect, TopKPairs, VectorSum}

/** Optimizer rule: `array_intersect(sort_array(x), sort_array(y))`
  * over null-free array<long> → the [[SortedIntersect]] merge kernel.
  *
  * `array_intersect` builds a hash set per row; when both inputs are
  * syntactically sorted (`sort_array(_, asc)`) the kernel computes the
  * identical result (ordered, deduped) in one branch-predictable
  * two-pointer scan — the q58 triangle-count hot loop, here made
  * available to ANY query written declaratively. Guards: ascending
  * sort on both children and non-nullable long elements (the kernel
  * reads primitives; sort_array puts nulls first, which would be
  * misread). A user query that hits the guard keeps the builtin.
  */
object RewriteSortedIntersect extends Rule[LogicalPlan] {
  private def longsNoNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayIntersect(l @ SortArray(_, asc1), r @ SortArray(_, asc2))
          if asc1.foldable && asc2.foldable
            && asc1.eval() == true && asc2.eval() == true
            && longsNoNull(l) && longsNoNull(r) =>
        SortedIntersect(l, r)
    }
}

/** Spark-native extension entry point: installs the engine's custom
  * Catalyst expressions into a session the way any Spark library
  * should —
  *
  *   spark.sql.extensions=graft.GraftExtensions            (config)
  *   SparkSession.builder.withExtensions(new GraftExtensions)  (code)
  *
  * `injectFunction` registers them as permanent session functions, so
  * both the Column API ([[DotProduct.dotFast]], [[SimHash64.simhash64]])
  * and plain SQL (`SELECT graft_dot(a, b)`) resolve them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteSortedIntersect)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_matvec"),
      new ExpressionInfo(classOf[MatVecDots].getName, "graft_matvec"),
      (exprs: Seq[Expression]) => MatVecDots(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vecsum"),
      new ExpressionInfo(classOf[VectorSum].getName, "graft_vecsum"),
      (exprs: Seq[Expression]) => VectorSum(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (exprs: Seq[Expression]) => TopKPairs(exprs(0), exprs(1), exprs(2),
        exprs(3), exprs(4).eval().asInstanceOf[Number].intValue())))
  }
}

object GraftExtensions {
  /** Imperative fallback for sessions built without the extension
    * hook (the operators also call this defensively — registration is
    * idempotent).
    */
  def registerAll(spark: SparkSession): Unit = {
    DotProduct.register(spark)
    SimHash64.register(spark)
    MatVecDots.register(spark)
    VectorSum.register(spark)
    TopKPairs.register(spark)
  }
}
