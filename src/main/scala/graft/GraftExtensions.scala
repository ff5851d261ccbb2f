package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, ArrayIntersect, EqualTo, Expression, ExpressionInfo, If, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Size, SortArray, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

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

/** Optimizer rule: the composable HOF dot product
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`
  * → the [[DotProduct]] kernel, guarded by a runtime length-equality
  * check so the rewrite is STRICTLY semantics-preserving: with equal
  * lengths and non-nullable double elements the kernel folds in the
  * identical left-to-right order (bit-identical result); with ragged
  * lengths the builtin is PROVABLY null (zip_with null-pads, the
  * first null poisons the fold), so the guard's else branch is a null
  * literal — never the original expression, which transformDown would
  * re-match forever. A null input array nulls the size comparison and
  * lands in the same branch, again matching the builtin.
  *
  * This is the "functions, not UDFs" ladder closing its loop: users
  * write the declarative HOF; the session plans the same tight loop
  * [[graft.ops.Similarity]] calls explicitly.
  */
object RewriteHofDot extends Rule[LogicalPlan] {
  private def doublesNoNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(
                x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(
              acc1: NamedLambdaVariable, el1: NamedLambdaVariable, _),
              Seq(acc2: NamedLambdaVariable, el2: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fin2: NamedLambdaVariable), _))
          if zero == 0.0
            && x1.exprId == x2.exprId && y1.exprId == y2.exprId
            && acc1.exprId == acc2.exprId && el1.exprId == el2.exprId
            && fin.exprId == fin2.exprId
            && doublesNoNull(a) && doublesNoNull(b)
            // The rewrite duplicates a and b (Size(a), Size(b), kernel);
            // the builtin evaluates each array once. Catalyst convention
            // for subexpression-duplicating rules: nondeterministic
            // children keep the original form.
            && a.deterministic && b.deterministic =>
        If(EqualTo(Size(a), Size(b)),
          graft.functions.DotProduct(a, b), Literal(null, DoubleType))
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
    ext.injectOptimizerRule(_ => RewriteHofDot)
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
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName,
        "graft_sorted_intersect"),
      (exprs: Seq[Expression]) => SortedIntersect(exprs(0), exprs(1))))
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
    SortedIntersect.register(spark)
  }
}
