package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free 24-bit uncompressed BMP codec (pure JVM — this
  * container ships no image libraries, but BMP's fixed 54-byte header +
  * bottom-up BGR rows need none). Replaces the round-1 `FakeCodec` stub
  * as the real decoder behind the multimodal feature-extraction seam:
  * the features below are computed from actual decoded pixels.
  */
object BmpCodec {

  val HeaderSize = 54

  /** Encode a top-down RGB pixel array (3 bytes/px, row-major) as a
    * standard bottom-up 24-bit BMP with 4-byte row padding.
    */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(HeaderSize + dataSize).putInt(0).putInt(HeaderSize)
    buf.putInt(40).putInt(w).putInt(h)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        buf.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i)) // BGR
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode to (width, height, top-down RGB bytes). Throws on anything
    * that isn't a positive-height 24-bit uncompressed BMP.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= HeaderSize && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(w > 0 && h > 0 && bpp == 24 && compression == 0,
      s"unsupported BMP: ${w}x$h bpp=$bpp compression=$compression")
    val rowSize = (w * 3 + 3) / 4 * 4
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = dataOffset + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        rgb(i) = bytes(src + x * 3 + 2)
        rgb(i + 1) = bytes(src + x * 3 + 1)
        rgb(i + 2) = bytes(src + x * 3)
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** Real image features from decoded pixels: [meanR, meanG, meanB,
    * meanLuma, luma-histogram...] (all in [0,1], histogram bins fill
    * the remaining dim-4 slots).
    */
  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    val (w, h, rgb) = decode(bytes)
    val out = new Array[Float](dim)
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    val bins = math.max(1, dim - 4)
    val hist = new Array[Int](bins)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      hist(math.min(bins - 1, luma * bins / 256)) += 1
      i += 1
    }
    if (dim > 0) out(0) = sr.toFloat / n / 255f
    if (dim > 1) out(1) = sg.toFloat / n / 255f
    if (dim > 2) out(2) = sb.toFloat / n / 255f
    if (dim > 3) out(3) = (0.299f * out(0) + 0.587f * out(1) + 0.114f * out(2))
    var k = 0
    while (dim > 4 && k < bins) {
      out(4 + k) = hist(k).toFloat / n
      k += 1
    }
    out
  }

  /** 64-bit difference hash (dHash) from decoded pixels: sample the
    * luma on a 9x8 nearest-neighbor grid, emit bit (y*8 + x) = 1 iff
    * luma(x, y) > luma(x+1, y). Robust to uniform rescaling (the grid
    * resamples to the same relative positions) and to small brightness
    * shifts (only ORDER of adjacent cells matters) — the standard
    * perceptual fingerprint for image near-dup detection.
    */
  def dhash64(bytes: Array[Byte]): Long = {
    val (w, h, rgb) = decode(bytes)
    // block-MEAN pooling, not point sampling: the mean over a grid
    // cell survives nearest-neighbor rescaling (each cell still
    // averages the same image region), where a point sample lands on
    // a different source pixel and flips bits near luma wraparounds
    def luma(gx: Int, gy: Int): Double = {
      val x0 = gx * w / 9; val x1 = math.max(x0 + 1, (gx + 1) * w / 9)
      val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
      var s = 0L; var n = 0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val i = (y * w + x) * 3
          s += (299 * (rgb(i) & 0xff) + 587 * (rgb(i + 1) & 0xff)
            + 114 * (rgb(i + 2) & 0xff)) / 1000
          n += 1
          x += 1
        }
        y += 1
      }
      s.toDouble / n
    }
    var sig = 0L
    var gy = 0
    while (gy < 8) {
      val row = Array.tabulate(9)(gx => luma(gx, gy))
      var gx = 0
      while (gx < 8) {
        if (row(gx) > row(gx + 1)) sig |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    sig
  }

  /** Nearest-neighbor downscale so max(w, h) <= maxSide (no-op when
    * already within bounds); returns re-encoded BMP bytes.
    */
  def resize(bytes: Array[Byte], maxSide: Int): Array[Byte] = {
    val (w, h, rgb) = decode(bytes)
    if (math.max(w, h) <= maxSide) bytes
    else {
      val scale = maxSide.toDouble / math.max(w, h)
      val nw = math.max(1, (w * scale).toInt)
      val nh = math.max(1, (h * scale).toInt)
      val out = new Array[Byte](nw * nh * 3)
      var y = 0
      while (y < nh) {
        val sy = math.min(h - 1, (y / scale).toInt)
        var x = 0
        while (x < nw) {
          val sx = math.min(w - 1, (x / scale).toInt)
          val si = (sy * w + sx) * 3
          val di = (y * nw + x) * 3
          out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
          x += 1
        }
        y += 1
      }
      encode(nw, nh, out)
    }
  }

  /** Deterministic synthetic image for a seed text: dimensions and a
    * smooth two-frequency pixel pattern keyed off the text hash — the
    * dev-harness generator for real-decoder tests (production reads
    * real binary columns).
    */
  def synthesize(seedText: String): Array[Byte] = {
    val hash = scala.util.hashing.MurmurHash3.stringHash(seedText)
    val w = 8 + math.floorMod(hash, 25)
    val h = 8 + math.floorMod(hash >> 8, 17)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        rgb(i) = ((x * 7 + y * 3 + hash) & 0xff).toByte
        rgb(i + 1) = ((x * 2 + y * 11 + (hash >> 4)) & 0xff).toByte
        rgb(i + 2) = ((x * 5 + y * 5 + (hash >> 9)) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    encode(w, h, rgb)
  }
}
