package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tile-grid choropleth sink — the engine-scope rendering of the
  * reference's US-map stage (`Method_code.Rmd:513-550`, `plot_usmap` +
  * `ggsave`): per-area values are binned onto a linear color ramp and
  * drawn as grid tiles into a real 24-bit BMP via [[BmpCodec]].
  *
  * Two deliberately separated halves:
  *   - [[shaded]] — the DISTRIBUTED part: min/max normalization and
  *     bin assignment as Column expressions (broadcast 1-row extent
  *     join), fully SQL-expressible and oracle-checked (m08). `floor`
  *     binning, not `round`: floor has identical semantics in every
  *     engine, while round's half-way tie-breaking differs.
  *   - [[render]] — the SINK part: collects the (key, value) table —
  *     legal because a choropleth input is dimension-sized (one row
  *     per area) no matter how big the data that produced it — and
  *     rasterizes tiles.
  *
  * The tile-grid layout (rather than geographic polygons) is the
  * standard equal-weight cartogram from data journalism; a US state
  * layout ships as the reference-faithful default, and any keyed
  * layout works (the query entry uses the TPC-H nations).
  */
object Choropleth {

  /** shade bin in [0, bins): floor((v - min) / (max - min) * bins),
    * clamped; degenerate extent (min == max) maps everything to 0.
    */
  def shadeCol(v: Column, vMin: Column, vMax: Column, bins: Int): Column =
    when(vMax === vMin, 0)
      .otherwise(least(lit(bins - 1),
        floor((v - vMin) / (vMax - vMin) * bins).cast("int")))

  /** (key, value, shade) with the extent computed distributed-side and
    * broadcast back (one 1-row cross join — no collect, no window over
    * an unpartitioned frame).
    */
  def shaded(df: DataFrame, keyCol: String, valueCol: String,
             bins: Int = 9): DataFrame = {
    val mm = df.agg(min(col(valueCol)).as("__vmin"),
      max(col(valueCol)).as("__vmax"))
    df.crossJoin(broadcast(mm))
      .select(col(keyCol), col(valueCol),
        shadeCol(col(valueCol), col("__vmin"), col("__vmax"), bins)
          .as("shade"))
  }

  /** Linear RGB ramp between `low` and `high` at t in [0,1]. */
  private def lerp(low: (Int, Int, Int), high: (Int, Int, Int),
                   t: Double): (Int, Int, Int) = (
    (low._1 + (high._1 - low._1) * t).round.toInt,
    (low._2 + (high._2 - low._2) * t).round.toInt,
    (low._3 + (high._3 - low._3) * t).round.toInt)

  /** RGB for a shade bin (shared by render and the spec). */
  def shadeColor(shade: Int, bins: Int,
                 low: (Int, Int, Int) = (239, 243, 255),
                 high: (Int, Int, Int) = (8, 48, 107)): (Int, Int, Int) =
    lerp(low, high, if (bins <= 1) 0.0 else shade.toDouble / (bins - 1))

  /** Render the (already aggregated, dimension-sized) table as a
    * tile-grid BMP. Keys absent from `layout` are skipped; grid cells
    * with no data stay background.
    */
  def render(df: DataFrame, keyCol: String, valueCol: String,
             layout: Map[String, (Int, Int)], cell: Int = 12,
             bins: Int = 9,
             low: (Int, Int, Int) = (239, 243, 255),
             high: (Int, Int, Int) = (8, 48, 107),
             background: (Int, Int, Int) = (255, 255, 255)): Array[Byte] = {
    val rows = df.select(col(keyCol).cast("string"),
      col(valueCol).cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val vs = rows.map(_._2)
    val (vMin, vMax) =
      if (vs.isEmpty) (0.0, 0.0) else (vs.min, vs.max)
    def shade(v: Double): Int =
      if (vMax == vMin) 0
      else math.min(bins - 1, math.floor((v - vMin) / (vMax - vMin) * bins).toInt)
    val nRows = layout.values.map(_._1).max + 1
    val nCols = layout.values.map(_._2).max + 1
    val (w, h) = (nCols * cell, nRows * cell)
    val px = new Array[Byte](w * h * 3)
    // background fill
    var i = 0
    while (i < px.length) {
      px(i) = background._1.toByte
      px(i + 1) = background._2.toByte
      px(i + 2) = background._3.toByte
      i += 3
    }
    rows.foreach { case (k, v) =>
      layout.get(k).foreach { case (r, c) =>
        val (cr, cg, cb) = shadeColor(shade(v), bins, low, high)
        var y = r * cell
        while (y < (r + 1) * cell) {
          var x = c * cell
          while (x < (c + 1) * cell) {
            val o = (y * w + x) * 3
            px(o) = cr.toByte; px(o + 1) = cg.toByte; px(o + 2) = cb.toByte
            x += 1
          }
          y += 1
        }
      }
    }
    BmpCodec.encode(w, h, px)
  }

  /** Render the (dimension-sized) per-state table as a TRUE-GEOMETRY
    * US choropleth: simplified state outline polygons ([[UsGeo]],
    * coordinates embedded as data), Albers equal-area projection, and
    * an even-odd scanline fill into the same 24-bit [[BmpCodec]] BMP
    * as [[render]] — closing the visual-fidelity gap vs the
    * reference's `plot_usmap` polygons (`Method_code.Rmd:513-550`).
    * AK/HI are inset below the lower-left, the `plot_usmap`
    * convention (AK scaled 0.35). Shade semantics are IDENTICAL to
    * [[render]]/[[shaded]] (same floor binning, same ramp), so m08's
    * oracle-gated shade table drives both rasterizations; only the
    * geometry differs. Deterministic: pure double arithmetic on
    * literal coordinates — golden-image spec'd.
    */
  def renderUs(df: DataFrame, keyCol: String, valueCol: String,
               width: Int = 400, bins: Int = 9,
               low: (Int, Int, Int) = (239, 243, 255),
               high: (Int, Int, Int) = (8, 48, 107),
               background: (Int, Int, Int) = (255, 255, 255),
               limits: Option[(Double, Double)] = None): Array[Byte] = {
    val rows = df.select(col(keyCol).cast("string"),
      col(valueCol).cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val vs = rows.map(_._2)
    // `limits` = the reference's fixed scale (`scale_fill_gradientn(...,
    // limits = c(0, 96))`, Method_code.Rmd:516,527): a PAIR of maps
    // (direct | EBP) must shade equal values equally, which per-map
    // min/max normalization cannot guarantee
    val (vMin, vMax) = limits.getOrElse(
      if (vs.isEmpty) (0.0, 0.0) else (vs.min, vs.max))
    def shade(v: Double): Int =
      if (vMax == vMin) 0
      else math.max(0, math.min(bins - 1,
        math.floor((v - vMin) / (vMax - vMin) * bins).toInt))

    def proj(rings: Seq[Seq[(Double, Double)]]) =
      rings.map(_.map { case (lo, la) => UsGeo.albers(lo, la) })
    def bbox(rings: Seq[Seq[(Double, Double)]]) = {
      val pts = rings.flatten
      (pts.map(_._1).min, pts.map(_._1).max,
        pts.map(_._2).min, pts.map(_._2).max)
    }
    // move a projected shape so its scaled bbox's (minx, maxy) lands
    // at (tx, ty) — inset placement in projected space
    def place(rings: Seq[Seq[(Double, Double)]], scale: Double,
              tx: Double, ty: Double) = {
      val (minx, _, _, maxy) = bbox(rings)
      rings.map(_.map { case (x, y) =>
        (tx + (x - minx) * scale, ty - (maxy - y) * scale) })
    }
    val conusP = UsGeo.conus.map { case (k, r) => k -> proj(r) }
    val (cMinX, _, cMinY, _) = bbox(conusP.values.flatten.toSeq)
    // insets: AK at 0.35 under the conus lower-left, HI to its right
    val ak = place(proj(UsGeo.alaska), 0.35, cMinX, cMinY - 0.01)
    val (_, akMaxX, akMinY, _) = bbox(ak)
    val hi = place(proj(UsGeo.hawaii), 1.0, akMaxX + 0.02, akMinY + 0.05)
    val allGeo = conusP + ("AK" -> ak) + ("HI" -> hi)

    val (gMinX, gMaxX, gMinY, gMaxY) = bbox(allGeo.values.flatten.toSeq)
    val pad = 4
    val s = (width - 2 * pad) / (gMaxX - gMinX)
    val h = math.ceil((gMaxY - gMinY) * s).toInt + 2 * pad
    val px = new Array[Byte](width * h * 3)
    var i = 0
    while (i < px.length) {
      px(i) = background._1.toByte
      px(i + 1) = background._2.toByte
      px(i + 2) = background._3.toByte
      i += 3
    }
    def toPx(p: (Double, Double)): (Double, Double) =
      ((p._1 - gMinX) * s + pad, (gMaxY - p._2) * s + pad)
    rows.foreach { case (k, v) =>
      allGeo.get(k).foreach { rings =>
        val (cr, cg, cb) = shadeColor(shade(v), bins, low, high)
        rings.foreach(r => fillRing(px, width, h, r.map(toPx), cr, cg, cb))
      }
    }
    BmpCodec.encode(width, h, px)
  }

  /** Even-odd scanline fill of one closed ring given in pixel
    * coordinates: for each scanline (sampled at pixel centers y+0.5),
    * edges crossing it are intersected, crossings sorted, and interior
    * spans filled between alternate pairs — the textbook polygon
    * rasterizer. Half-open edge rule (p1.y <= yc < p2.y) counts a
    * vertex crossing exactly once.
    */
  private def fillRing(px: Array[Byte], w: Int, h: Int,
                       ring: Seq[(Double, Double)],
                       cr: Int, cg: Int, cb: Int): Unit = {
    if (ring.size < 3) return
    val n = ring.size
    val yMin = math.max(0, math.floor(ring.map(_._2).min).toInt)
    val yMax = math.min(h - 1, math.ceil(ring.map(_._2).max).toInt)
    var y = yMin
    while (y <= yMax) {
      val yc = y + 0.5
      val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
      var e = 0
      while (e < n) {
        val (x1, y1) = ring(e)
        val (x2, y2) = ring((e + 1) % n)
        if ((y1 <= yc && yc < y2) || (y2 <= yc && yc < y1))
          xs += x1 + (yc - y1) * (x2 - x1) / (y2 - y1)
        e += 1
      }
      val sorted = xs.sorted
      var p = 0
      while (p + 1 < sorted.length) {
        val x0 = math.max(0, math.ceil(sorted(p) - 0.5).toInt)
        val x1 = math.min(w - 1, math.floor(sorted(p + 1) - 0.5).toInt)
        var x = x0
        while (x <= x1) {
          val o = (y * w + x) * 3
          px(o) = cr.toByte; px(o + 1) = cg.toByte; px(o + 2) = cb.toByte
          x += 1
        }
        p += 2
      }
      y += 1
    }
  }

  /** Horizontal composition of two equal-height BMPs — the
    * `ggarrange(plot_direct, plot_EBP, ncol = 2)` figure of the
    * reference (`Method_code.Rmd:540-543`): the direct-estimate and
    * EBP maps side by side in ONE image. Pure pixel concatenation;
    * deterministic given deterministic inputs.
    */
  def sideBySide(left: Array[Byte], right: Array[Byte]): Array[Byte] = {
    val (wl, hl, pl) = BmpCodec.decode(left)
    val (wr, hr, pr) = BmpCodec.decode(right)
    require(hl == hr, s"panel heights differ: $hl vs $hr")
    val w = wl + wr
    val px = new Array[Byte](w * hl * 3)
    var y = 0
    while (y < hl) {
      System.arraycopy(pl, y * wl * 3, px, y * w * 3, wl * 3)
      System.arraycopy(pr, y * wr * 3, px, y * w * 3 + wl * 3, wr * 3)
      y += 1
    }
    BmpCodec.encode(w, hl, px)
  }

  /** A compact alphabetical grid for arbitrary key sets (the TPC-H
    * nations have no geography): ceil(sqrt(n)) columns, row-major.
    */
  def gridLayout(keys: Seq[String]): Map[String, (Int, Int)] = {
    val ks = keys.distinct.sorted
    val cols = math.ceil(math.sqrt(ks.length.toDouble)).toInt.max(1)
    ks.zipWithIndex.map { case (k, i) => k -> (i / cols, i % cols) }.toMap
  }

  /** The standard US state tile grid (public-knowledge cartogram
    * layout) — the reference-faithful default for `plot_usmap` data.
    */
  val usTileGrid: Map[String, (Int, Int)] = Map(
    "AK" -> (0, 0), "ME" -> (0, 11),
    "VT" -> (1, 10), "NH" -> (1, 11),
    "WA" -> (2, 1), "ID" -> (2, 2), "MT" -> (2, 3), "ND" -> (2, 4),
    "MN" -> (2, 5), "IL" -> (2, 6), "WI" -> (2, 7), "MI" -> (2, 8),
    "NY" -> (2, 9), "RI" -> (2, 10), "MA" -> (2, 11),
    "OR" -> (3, 1), "NV" -> (3, 2), "WY" -> (3, 3), "SD" -> (3, 4),
    "IA" -> (3, 5), "IN" -> (3, 6), "OH" -> (3, 7), "PA" -> (3, 8),
    "NJ" -> (3, 9), "CT" -> (3, 10),
    "CA" -> (4, 1), "UT" -> (4, 2), "CO" -> (4, 3), "NE" -> (4, 4),
    "MO" -> (4, 5), "KY" -> (4, 6), "WV" -> (4, 7), "VA" -> (4, 8),
    "MD" -> (4, 9), "DE" -> (4, 10),
    "AZ" -> (5, 2), "NM" -> (5, 3), "KS" -> (5, 4), "AR" -> (5, 5),
    "TN" -> (5, 6), "NC" -> (5, 7), "SC" -> (5, 8), "DC" -> (5, 9),
    "OK" -> (6, 4), "LA" -> (6, 5), "MS" -> (6, 6), "AL" -> (6, 7),
    "GA" -> (6, 8),
    "HI" -> (7, 0), "TX" -> (7, 4), "FL" -> (7, 9))
}
