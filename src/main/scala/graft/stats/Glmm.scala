package graft.stats

import breeze.linalg.DenseVector
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.etl.Encodings

/** Distributed logistic regression + mixed-model scoring
  * (SURVEY.md M1/M2; reference `glmer`/`predict`,
  * `Method_code.Rmd:68-81,171-181`).
  *
  * The fixed-effects fit minimizes the logistic NLL with Breeze L-BFGS
  * on the driver; each objective evaluation is one `treeAggregate` over
  * a cached `RDD[(y, x)]` — the classic Spark pattern (mllib's own
  * LogisticRegression does the same dance). This scales to arbitrarily
  * many rows: per-evaluation cost is one pass, communication is
  * O(numFeatures * log(numPartitions)) via the tree reduction, and no
  * per-row data ever reaches the driver.
  *
  * The random-intercept SD is NOT estimated here — per the paper, the
  * engine's own EM (graft.stats.Em) replaces glmer's integral
  * approximation; this fit is the initializer/benchmark, exactly the
  * role glmer plays in the reference (`Method_code.Rmd:592-593`).
  */
object Glmm {

  /** log(1 + e^x) without overflow. */
  def log1pExp(x: Double): Double =
    if (x > 0) x + math.log1p(math.exp(-x)) else math.log1p(math.exp(x))

  def sigmoidD(x: Double): Double =
    if (x >= 0) 1.0 / (1.0 + math.exp(-x)) else { val e = math.exp(x); e / (1.0 + e) }

  /** Project a DataFrame to a cached design RDD: y plus [1, x1..xk]
    * (intercept prepended). Columns are cast to double once here so the
    * hot optimizer loop does no conversion.
    */
  def designRdd(df: DataFrame, yCol: String,
                featureCols: Seq[String]): RDD[(Double, Array[Double])] = {
    val cols = (col(yCol).cast("double") +:
      featureCols.map(c => col(c).cast("double"))).toArray
    df.select(cols.toIndexedSeq: _*).rdd.map { r =>
      val x = new Array[Double](featureCols.length + 1)
      x(0) = 1.0
      var i = 0
      while (i < featureCols.length) { x(i + 1) = r.getDouble(i + 1); i += 1 }
      (r.getDouble(0), x)
    }.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** (NLL, gradient) of logistic regression over the design RDD in one
    * tree-aggregated pass; optional L2 ridge for separation robustness.
    * `scale` (typically 1/n) conditions the objective so L-BFGS line
    * searches behave identically at any data size.
    */
  def nllGrad(data: RDD[(Double, Array[Double])], beta: DenseVector[Double],
              l2: Double = 0.0,
              scale: Double = 1.0): (Double, DenseVector[Double]) = {
    val k = beta.length
    val b = beta.toArray
    val (loss, grad) = data.treeAggregate((0.0, new Array[Double](k)))(
      seqOp = { case ((l, g), (y, x)) =>
        var eta = 0.0
        var i = 0
        while (i < k) { eta += b(i) * x(i); i += 1 }
        val p = sigmoidD(eta)
        i = 0
        while (i < k) { g(i) += (p - y) * x(i); i += 1 }
        (l + log1pExp(eta) - y * eta, g)
      },
      combOp = { case ((l1, g1), (l2v, g2)) =>
        var i = 0
        while (i < k) { g1(i) += g2(i); i += 1 }
        (l1 + l2v, g1)
      },
      depth = 2)
    val gv = DenseVector(grad) * scale
    val sLoss = loss * scale
    if (l2 > 0) (sLoss + 0.5 * l2 * (beta dot beta), gv + beta * l2)
    else (sLoss, gv)
  }

  /** Fit fixed-effects logistic regression; returns beta with intercept
    * at index 0 (feature order = featureCols).
    *
    * With `compress = true` (default) the design is first collapsed to
    * its distinct-covariate cells — (x, m = count, sumY = sum y), one
    * map-side-combining shuffle; see [[graft.stats.Em.Cell]] — and,
    * when the cell table fits `maxLocalCells`, the entire L-BFGS runs
    * driver-side over the weighted cells: exact (y enters the NLL
    * linearly) and, for categorical designs, independent of row count.
    * Pass `compress = false` for continuous covariates.
    */
  def fitLogistic(df: DataFrame, yCol: String, featureCols: Seq[String],
                  l2: Double = 1e-8, maxIter: Int = 100,
                  compress: Boolean = true,
                  maxLocalCells: Int = 1 << 16): DenseVector[Double] = {
    val init = DenseVector.zeros[Double](featureCols.length + 1)
    val localCells: Option[Array[(Array[Double], Double, Double)]] =
      if (compress) {
        val cellsDf = df
          .groupBy(featureCols.map(c => col(c).cast("double").as(c)): _*)
          .agg(count(lit(1)).cast("double").as("m"),
            sum(col(yCol).cast("double")).as("sumY"))
        val rows = cellsDf.limit(maxLocalCells + 1).collect()
        if (rows.length > maxLocalCells) None
        else {
          import scala.math.Ordering.Implicits._
          Some(rows.map { r =>
            val x = new Array[Double](featureCols.length + 1)
            x(0) = 1.0
            var i = 0
            while (i < featureCols.length) { x(i + 1) = r.getDouble(i); i += 1 }
            (x, r.getDouble(featureCols.length),
              r.getDouble(featureCols.length + 1))
          }.sortBy(_._1.toSeq))
        }
      } else None
    localCells match {
      case Some(cells) =>
        val totalN = cells.map(_._2).sum
        val scale = 1.0 / math.max(1.0, totalN)
        Optimize.lbfgsMin({ beta =>
          val k = beta.length
          val b = beta.toArray
          var loss = 0.0
          val grad = new Array[Double](k)
          var ci = 0
          while (ci < cells.length) {
            val (x, m, sy) = cells(ci)
            var eta = 0.0
            var i = 0
            while (i < k) { eta += b(i) * x(i); i += 1 }
            val p = sigmoidD(eta)
            loss += m * log1pExp(eta) - sy * eta
            i = 0
            while (i < k) { grad(i) += (m * p - sy) * x(i); i += 1 }
            ci += 1
          }
          val gv = DenseVector(grad) * scale
          val sLoss = loss * scale
          if (l2 > 0) (sLoss + 0.5 * l2 * (beta dot beta), gv + beta * l2)
          else (sLoss, gv)
        }, init, maxIter)
      case None =>
        val data = designRdd(df, yCol, featureCols)
        try {
          val scale = 1.0 / math.max(1L, data.count()).toDouble
          Optimize.lbfgsMin(nllGrad(data, _, l2, scale), init, maxIter)
        } finally data.unpersist(blocking = false)
    }
  }

  /** Linear-predictor Column from a fitted beta (intercept at index 0),
    * the Column-algebra mirror of the reference's `x_beta_func`
    * (`Method_code.Rmd:94-140`). Implements intended semantics per
    * SURVEY.md Q1: uses the passed intercept, not a global.
    */
  def xBetaCol(beta: DenseVector[Double], featureCols: Seq[String]): Column =
    Encodings.xBeta(beta(0),
      featureCols.zipWithIndex.map { case (c, i) =>
        (col(c).cast("double"), beta(i + 1))
      })

  /** Mixed-model scoring (reference `predict` with `re.form=~(1|state)`,
    * `Method_code.Rmd:171-181`): sigmoid(x'beta + u_area), where areas
    * absent from the random-effect table get u = 0 — the general rule
    * behind the reference's MT/SD special-case (SURVEY.md Q6). The
    * random-effect side is area-level (small) → broadcast join.
    */
  def scoreWithRanef(df: DataFrame, beta: DenseVector[Double],
                     featureCols: Seq[String], ranef: DataFrame,
                     areaCol: String, uCol: String = "u",
                     as: String = "p"): DataFrame =
    df.join(broadcast(ranef.select(col(areaCol), col(uCol))),
        Seq(areaCol), "left")
      .withColumn(as,
        Encodings.sigmoid(xBetaCol(beta, featureCols) +
          coalesce(col(uCol), lit(0.0))))
      .drop(uCol)

  /** MRP — multilevel regression + post-stratification (Gelman &
    * Little 1997; the modern small-area celebrity tying the multilevel
    * fit (M1) to the post-stratification table (M14)): the fitted
    * model predicts p for every POPULATION covariate cell, and the
    * area estimate is the cell-count-weighted mean of those
    * predictions. `big` is the unit-level population frame; it is
    * first collapsed to (area × covariate-cell) weight totals — at
    * 100 TB that single map-side-combining groupBy is the only pass
    * over the frame, and everything after is dimension-sized (cells ×
    * areas) with the random-effect table broadcast via
    * [[scoreWithRanef]]. Areas absent from `ranef` predict at u = 0
    * (the Q6 coalesce rule).
    */
  def mrp(big: DataFrame, beta: DenseVector[Double],
          featureCols: Seq[String], ranef: DataFrame,
          areaCol: String, weightCol: String,
          scale: Double = 100.0): DataFrame = {
    val cells = big.groupBy(areaCol, featureCols: _*)
      .agg(sum(weightCol).as("n_cell"))
    scoreWithRanef(cells, beta, featureCols, ranef, areaCol)
      .groupBy(areaCol)
      .agg((sum(col("n_cell") * col("p")) / sum("n_cell") * scale)
        .as("mrp"))
  }
}
