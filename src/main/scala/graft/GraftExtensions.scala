package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MatVecDots, SimHash64, TopKPairs, VectorSum}

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
