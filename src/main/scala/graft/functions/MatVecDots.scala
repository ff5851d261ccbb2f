package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Matrix-vector dot products as ONE native Catalyst expression:
  * `graft_matvec(v, M)` returns `array(M(0)·v, …, M(k-1)·v)`.
  *
  * The composable alternative — k separate [[DotProduct]] calls, each
  * against its own `array(lit, …)` row literal — puts k×dim literal
  * nodes into the plan. At IVF/LSH scale (16 centroids × 64 dims,
  * twice per query) that is thousands of expression nodes, and
  * Catalyst's analysis + optimizer tree walks dominate wall time
  * before a single row is read (measured: ~10s of fixed planning cost
  * for s03 regardless of data size). Here the matrix is a single
  * foldable literal (one plan node); rows are extracted once into
  * primitive arrays and every eval is the same tight loop a native
  * engine would run.
  */
case class MatVecDots(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_matvec requires (array<double>, array<array<double>>), got ($l, $r)")
    }

  private def extract(m: Any): Array[Array[Double]] = {
    val rows = m.asInstanceOf[ArrayData]
    Array.tabulate(rows.numElements()) { i =>
      rows.getArray(i).toDoubleArray()
    }
  }

  // the matrix is a literal in every real plan: extract its rows to
  // primitive arrays once, not per input row
  @transient private lazy val constMat: Array[Array[Double]] =
    if (right.foldable) extract(right.eval(null)) else null

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val m = if (constMat != null) constMat else extract(r)
    val out = new Array[Double](m.length)
    var c = 0
    while (c < m.length) {
      val row = m(c)
      val n = math.min(v.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += v.getDouble(i) * row(i)
        i += 1
      }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Public entry for generated code (nullSafeEval is protected). */
  def compute(v: Any, m: Any): ArrayData =
    nullSafeEval(v, m).asInstanceOf[ArrayData]

  /** Codegen: one call into [[compute]] through a reference object —
    * the loop itself isn't inlined (the cached `constMat` rows live on
    * the expression instance), but the surrounding projection stays in
    * its WholeStageCodegen span instead of falling back to an
    * interpreted path around a CodegenFallback node.
    */
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matvecExpr", this)
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = $ref.compute($v, $m);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MatVecDots = copy(left = l, right = r)
}

object MatVecDots {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_matvec", exprs => MatVecDots(exprs(0), exprs(1)), "scala_udf")

  def matvec(v: Column, m: Column): Column = call_function("graft_matvec", v, m)

  /** The matrix as one typed literal column (a single plan node). */
  def matrixLit(m: Seq[Array[Double]]): Column =
    typedLit(m.map(_.toSeq))
}
