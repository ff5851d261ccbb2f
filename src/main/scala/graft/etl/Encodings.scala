package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level encodings and scalar math (SURVEY.md §2.2, P1-P14).
  *
  * The reference (`/root/reference/Method_code.Rmd:94-151,227-237`)
  * implements these as per-row R loops and `ifelse` chains; here each is
  * a single Catalyst Column expression so it stays inside whole-stage
  * codegen and vectorizes for free.
  */
object Encodings {

  /** logit(p) = log(p / (1-p)). Reference `qlogis` (Method_code.Rmd:69,134). */
  def logit(p: Column): Column = log(p / (lit(1.0) - p))

  /** sigmoid(x) = 1/(1+e^-x), numerically stable in both tails.
    * Reference `exp(x)/(1+exp(x))` (Method_code.Rmd:254-255) overflows for
    * large x; the branch-free equivalent below does not.
    */
  def sigmoid(x: Column): Column =
    when(x >= 0, lit(1.0) / (lit(1.0) + exp(-x)))
      .otherwise(exp(x) / (lit(1.0) + exp(x)))

  /** Binary indicator for one categorical level (Method_code.Rmd:49,228-233). */
  def indicator(c: Column, level: String): Column =
    when(c === level, 1).otherwise(0)

  /** One-hot encode the given levels as `prefix_<level>` integer columns
    * (spaces in level names become underscores, mirroring the reference's
    * rename at Method_code.Rmd:53). Explicit `when` columns (not
    * ml.feature.OneHotEncoder) keep names stable for the oracle compare.
    */
  def oneHot(df: DataFrame, colName: String, levels: Seq[String],
             prefix: String): DataFrame =
    levels.foldLeft(df) { (d, lv) =>
      d.withColumn(s"${prefix}_${sanitize(lv)}", indicator(d(colName), lv))
    }

  /** Level name → stable column-name suffix (parquet/SQL-safe). */
  def sanitize(level: String): String =
    level.toLowerCase.replaceAll("[^a-z0-9]", "_")

  /** Deterministic synthetic row id (Method_code.Rmd:48).
    *
    * NOTE scale: a global `row_number()` forces a single-partition sort —
    * fine for dimension-sized tables, wrong for 100 TB. For large data
    * use [[contiguousId]] (same 1..n semantics, distributed) or
    * [[fingerprintId]] (stable 64-bit hash, no shuffle at all).
    */
  def rowId(df: DataFrame, orderCols: Seq[String],
            name: String = "id"): DataFrame =
    df.withColumn(name,
      row_number().over(Window.orderBy(orderCols.map(col): _*)))

  /** Contiguous 1..n row id in `orderCols` order WITHOUT the
    * single-partition sort: a distributed range-partitioned sort, then
    * the classic two-pass offset assignment (`zipWithIndex`: one count
    * job for per-partition offsets, one map). Equals `row_number()`
    * over the same total order whenever the order key is unique —
    * which is what the oracle checks.
    */
  def contiguousId(df: DataFrame, orderCols: Seq[String],
                   name: String = "id"): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = sorted.schema
      .add(name, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Shuffle-free stable id: xxhash64 over the natural-key columns. */
  def fingerprintId(df: DataFrame, keyCols: Seq[String],
                    name: String = "id"): DataFrame =
    df.withColumn(name, xxhash64(keyCols.map(col): _*))

  /** Linear predictor x'beta as one folded Column expression
    * (Method_code.Rmd:94-140 `x_beta_func`, :245-247 inline variant).
    * Betas are driver-side scalars baked in as literals — Catalyst
    * constant-folds them, matching the reference's scalar threading.
    */
  def xBeta(intercept: Double, terms: Seq[(Column, Double)]): Column =
    terms.foldLeft(lit(intercept): Column) {
      case (acc, (c, b)) => acc + c * lit(b)
    }
}
