package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-polygon spatial join over the embedded [[UsGeo]] state
  * outlines — the spatial-join family member (geo-tagging events /
  * customers to regions) built Spark-first: polygons are a
  * dimension-sized BROADCAST table of coordinate arrays, the
  * containment test is the classic even-odd crossing number evaluated
  * as a pure Column HOF (`aggregate` over the edge index sequence —
  * no UDF, no geometry library), and a bounding-box prefilter drops
  * almost every (point, polygon) candidate before the exact test.
  *
  * At 100 TB the points side stays a narrow scan: the polygon table
  * broadcasts (it is KB-sized), the bbox prefilter is a
  * codegen-friendly range conjunction, and the per-candidate cost is
  * O(vertices) arithmetic — the same shape a dedicated geo engine
  * runs, minus the R-tree (with thousands of polygons you'd bucket
  * points and polygons to a space-filling-curve grid first — the q56
  * Z-order machinery — and equi-join on the cell).
  *
  * Determinism contract: the crossing test
  * `(y1 > py) != (y2 > py) && px < x1 + (py - y1)*(x2 - x1)/(y2 - y1)`
  * is plain IEEE arithmetic, so DuckDB replays it bit-identically
  * from the same edge table; points exactly on a shared border
  * classify identically in both engines (possibly into either
  * neighbor — resolved by the deterministic min-state pick).
  */
object Spatial {

  /** CONUS polygon rings as a broadcastable DataFrame:
    * (state, ring, xs, ys, bbox columns). AK/HI are excluded — their
    * rings live outside the CONUS test grid this feeds.
    */
  def conusRings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    UsGeo.conus.toSeq.sortBy(_._1).flatMap { case (st, rings) =>
      rings.zipWithIndex.map { case (ring, ri) =>
        (st, ri, ring.map(_._1), ring.map(_._2),
          ring.map(_._1).min, ring.map(_._1).max,
          ring.map(_._2).min, ring.map(_._2).max)
      }
    }.toDF("state", "ring", "xs", "ys", "bxmin", "bxmax", "bymin",
      "bymax")
  }

  /** Even-odd crossing count of point (px, py) against the closed ring
    * (xs, ys) — open rings close implicitly via the modular next
    * index. Integer sum, so the parity is association-independent.
    */
  private def crossings(px: Column, py: Column, xs: Column,
                        ys: Column): Column = {
    val n = size(xs)
    aggregate(sequence(lit(0), n - 1), lit(0), (acc, i) => {
      val j = pmod(i + 1, n)
      val x1 = element_at(xs, i + 1); val y1 = element_at(ys, i + 1)
      val x2 = element_at(xs, j + 1); val y2 = element_at(ys, j + 1)
      acc + when(((y1 > py) =!= (y2 > py)) &&
        (px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)), 1).otherwise(0)
    })
  }

  /** Tag each point with the containing CONUS state ('NONE' if no
    * polygon contains it). Multi-ring states count a point inside if
    * ANY ring's crossing parity is odd (disjoint parts); shared-border
    * double-matches resolve to the alphabetically first state.
    */
  def pointInStateJoin(points: DataFrame, idCol: String, lonCol: String,
                       latCol: String): DataFrame = {
    val rings = conusRings(points.sparkSession)
    val cand = points.select(col(idCol).as("__id"),
        col(lonCol).as("px"), col(latCol).as("py"))
      .crossJoin(broadcast(rings))
      .filter(col("px") >= col("bxmin") && col("px") <= col("bxmax") &&
        col("py") >= col("bymin") && col("py") <= col("bymax"))
      .withColumn("odd",
        pmod(crossings(col("px"), col("py"), col("xs"), col("ys")), lit(2))
          === 1)
    val matched = cand.filter(col("odd"))
      .groupBy("__id").agg(min(col("state")).as("state"))
    points.select(col(idCol).as("__id"), col(lonCol).as(lonCol),
        col(latCol).as(latCol))
      .join(matched, Seq("__id"), "left")
      .select(col("__id").as(idCol), col(lonCol), col(latCol),
        coalesce(col("state"), lit("NONE")).as("state"))
  }

  /** The [[pointInStateJoin]] edge table rendered as a DuckDB VALUES
    * literal `(state, ring, x1, y1, x2, y2)` — the oracle replays the
    * identical crossing arithmetic from the identical coordinates.
    */
  def conusEdgeValues: String =
    UsGeo.conus.toSeq.sortBy(_._1).flatMap { case (st, rings) =>
      rings.zipWithIndex.flatMap { case (ring, ri) =>
        val closed = ring :+ ring.head
        closed.sliding(2).collect {
          case Seq((x1, y1), (x2, y2)) =>
            s"('$st',$ri,$x1,$y1,$x2,$y2)"
        }
      }
    }.mkString(",\n        ")
}
