package graft

import org.apache.spark.sql.functions._

import graft.ops.{BmpCodec, Choropleth}

class ChoroplethSpec extends SparkSpec {
  import spark.implicits._

  test("shaded bins by floor over the extent; degenerate extent -> 0") {
    val df = Seq(("a", 0.0), ("b", 5.0), ("c", 10.0)).toDF("k", "v")
    val r = Choropleth.shaded(df, "k", "v", bins = 3)
      .select("k", "shade").as[(String, Int)].collect().toMap
    // extent [0,10]: 0 -> floor(0)=0, 5 -> floor(1.5)=1, 10 -> clamp to 2
    assert(r == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val flat = Seq(("a", 4.0), ("b", 4.0)).toDF("k", "v")
    val f = Choropleth.shaded(flat, "k", "v", bins = 3)
      .select("shade").as[Int].collect().toSet
    assert(f == Set(0))
  }

  test("render paints each key's tile with its shade color, background " +
    "elsewhere; decode round-trips") {
    val df = Seq(("a", 0.0), ("b", 5.0), ("c", 10.0)).toDF("k", "v")
    val layout = Map("a" -> (0, 0), "b" -> (0, 1), "c" -> (1, 0))
    val cell = 4
    val bytes = Choropleth.render(df, "k", "v", layout, cell = cell, bins = 3)
    val (w, h, px) = BmpCodec.decode(bytes)
    assert(w == 2 * cell && h == 2 * cell)
    def pixelAt(x: Int, y: Int) = {
      val o = (y * w + x) * 3
      (px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)
    }
    // tile centers carry the exact ramp color for the key's shade
    assert(pixelAt(2, 2) == Choropleth.shadeColor(0, 3))
    assert(pixelAt(cell + 2, 2) == Choropleth.shadeColor(1, 3))
    assert(pixelAt(2, cell + 2) == Choropleth.shadeColor(2, 3))
    // the (1,1) grid cell has no key: stays background white
    assert(pixelAt(cell + 2, cell + 2) == (255, 255, 255))
  }

  test("renderUs rasterizes true state polygons: interior probes carry " +
    "the exact shade colors, no-data states stay background, " +
    "deterministic bytes") {
    // values chosen so shades are unambiguous: extent [0, 10], 3 bins
    val df = Seq(("TX", 0.0), ("CA", 5.0), ("MT", 10.0), ("FL", 10.0))
      .toDF("k", "v")
    val bytes = Choropleth.renderUs(df, "k", "v", width = 400, bins = 3)
    val (w, h, px) = BmpCodec.decode(bytes)
    assert(w == 400 && h > 100)
    // shade-color presence + area: each filled state contributes its
    // exact ramp color (the fill writes the literal RGB, so counting
    // exact-match pixels is a geometry-independent interior probe)
    def count(rgb: (Int, Int, Int)): Int = {
      var n = 0; var i = 0
      while (i < px.length) {
        if ((px(i) & 0xff) == rgb._1 && (px(i + 1) & 0xff) == rgb._2 &&
          (px(i + 2) & 0xff) == rgb._3) n += 1
        i += 3
      }
      n
    }
    val c0 = Choropleth.shadeColor(0, 3) // TX
    val c1 = Choropleth.shadeColor(1, 3) // CA
    val c2 = Choropleth.shadeColor(2, 3) // MT + FL
    // each shade present with substantial area (hundreds of px at
    // width 400 for states this big), and c2 covers two states
    assert(count(c0) > 300, s"TX area ${count(c0)}")
    assert(count(c1) > 300, s"CA area ${count(c1)}")
    assert(count(c2) > 400, s"MT+FL area ${count(c2)}")
    assert(count(c2) > count(c1), "two c2 states should out-area one")
    // no-data states stay background: white dominates the raster
    assert(count((255, 255, 255)) > w * h / 2)
    // determinism: bit-identical bytes on re-render
    val again = Choropleth.renderUs(df, "k", "v", width = 400, bins = 3)
    assert(java.util.Arrays.equals(bytes, again))
  }

  test("gridLayout is dense, collision-free, deterministic; usTileGrid " +
    "covers 50 states + DC without overlaps") {
    val keys = Seq("N5", "N1", "N3", "N2", "N4")
    val l = Choropleth.gridLayout(keys)
    assert(l.size == 5 && l.values.toSet.size == 5)
    assert(l == Choropleth.gridLayout(keys.reverse))
    assert(l("N1") == (0, 0)) // sorted, row-major
    assert(Choropleth.usTileGrid.size == 51)
    assert(Choropleth.usTileGrid.values.toSet.size == 51)
  }

  test("paired maps on shared limits shade equal values equally; " +
    "sideBySide composes the two panels pixel-exactly (the ggarrange " +
    "figure); both renders deterministic") {
    // two estimate sets over the same states; TX carries the SAME
    // value in both — with shared limits its color must match across
    // the pair, which per-map min/max normalization would break
    // (direct's extent [20,80] vs EBP's [20,50])
    val direct = Seq(("TX", 20.0), ("CA", 50.0), ("MT", 80.0))
      .toDF("k", "v")
    val ebp = Seq(("TX", 20.0), ("CA", 35.0), ("MT", 50.0))
      .toDF("k", "v")
    val lims = Some((0.0, 100.0))
    val l = Choropleth.renderUs(direct, "k", "v", bins = 9, limits = lims)
    val r = Choropleth.renderUs(ebp, "k", "v", bins = 9, limits = lims)
    val (wl, hl, pl) = BmpCodec.decode(l)
    val (wr, hr, pr) = BmpCodec.decode(r)
    assert(hl == hr && wl == wr)
    def count(px: Array[Byte], rgb: (Int, Int, Int)): Int = {
      var n = 0; var i = 0
      while (i < px.length) {
        if ((px(i) & 0xff) == rgb._1 && (px(i + 1) & 0xff) == rgb._2 &&
          (px(i + 2) & 0xff) == rgb._3) n += 1
        i += 3
      }
      n
    }
    // TX = 20.0 on limits (0,100) with 9 bins -> shade floor(0.2*9)=1
    // in BOTH panels; on per-map extents it would be shade 0 in both
    // but CA/MT would collide across panels
    val cTx = Choropleth.shadeColor(1, 9)
    assert(count(pl, cTx) > 300 && count(pr, cTx) > 300,
      s"TX color area: ${count(pl, cTx)} / ${count(pr, cTx)}")
    // MT differs across panels: shade 7 (80%) vs shade 4 (50%)
    assert(count(pl, Choropleth.shadeColor(7, 9)) > 300)
    assert(count(pr, Choropleth.shadeColor(4, 9)) > 300)
    val fig = Choropleth.sideBySide(l, r)
    val (wf, hf, pf) = BmpCodec.decode(fig)
    assert(wf == wl + wr && hf == hl)
    // panel pixels land verbatim: spot-check full rows
    for (y <- Seq(0, hl / 2, hl - 1)) {
      val row = pf.slice(y * wf * 3, (y * wf + wl) * 3).toSeq
      assert(row == pl.slice(y * wl * 3, (y + 1) * wl * 3).toSeq,
        s"left panel row $y")
      val rrow = pf.slice((y * wf + wl) * 3, (y + 1) * wf * 3).toSeq
      assert(rrow == pr.slice(y * wr * 3, (y + 1) * wr * 3).toSeq,
        s"right panel row $y")
    }
    // deterministic composition
    assert(java.util.Arrays.equals(fig, Choropleth.sideBySide(l, r)))
  }
}
