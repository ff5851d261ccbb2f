package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal real video container ("GVID"): a header + length-prefixed
  * 24-bit BMP frames — the video leg of the multimodal surface, next
  * to [[BmpCodec]] (image) and [[WavCodec]] (audio). Pure JVM, fully
  * decodable, no native codec: the point is that the Spark-side
  * plumbing (opaque binary column → batched partition-local frame
  * decode → relational shot analytics) is REAL; production swaps this
  * codec for ffmpeg-behind-the-same-seam.
  *
  * Layout (little-endian): magic "GVID" | frameMs int32 | nFrames
  * int32 | nFrames × (len int32 | BMP bytes).
  */
object VideoCodec {

  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  def encode(frames: Seq[Array[Byte]], frameMs: Int): Array[Byte] = {
    val total = 12 + frames.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).putInt(frameMs).putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** (frameMs, frames). Throws on a bad magic — corrupt containers
    * must fail loudly, not decode garbage.
    */
  def decode(bytes: Array[Byte]): (Int, Seq[Array[Byte]]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); bb.get(magic)
    require(java.util.Arrays.equals(magic, Magic), "not a GVID container")
    val frameMs = bb.getInt
    val n = bb.getInt
    val frames = (0 until n).map { _ =>
      val len = bb.getInt
      val f = new Array[Byte](len); bb.get(f); f
    }
    (frameMs, frames)
  }

  def frameCount(bytes: Array[Byte]): Int =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt(8)

  /** Deterministic synthetic clip: scene A (brightness-drifting copies
    * of one base image) with a hard cut at `cutAt` to scene B — the
    * PHOTOMETRIC INVERSE of scene A, which flips every adjacent-luma
    * comparison dHash encodes, so the cut is a structural near-64-bit
    * jump while the within-scene drift (+3 gray levels/frame) stays
    * well inside dHash's brightness invariance. That separation is
    * what lets shot detection be gated deterministically.
    */
  def synthesize(seedText: String, nFrames: Int, cutAt: Int,
                 frameMs: Int = 40): Array[Byte] = {
    def shifted(base: Array[Byte], delta: Int): Array[Byte] = {
      val (w, h, rgb) = BmpCodec.decode(base)
      val out = rgb.map { b =>
        math.min(255, math.max(0, (b & 0xff) + delta)).toByte
      }
      BmpCodec.encode(w, h, out)
    }
    val sceneA = BmpCodec.synthesize(seedText)
    val sceneB = {
      val (w, h, rgb) = BmpCodec.decode(sceneA)
      BmpCodec.encode(w, h, rgb.map(b => (255 - (b & 0xff)).toByte))
    }
    val frames = (0 until nFrames).map { i =>
      if (i < cutAt) shifted(sceneA, 3 * i)
      else shifted(sceneB, 3 * (i - cutAt))
    }
    encode(frames, frameMs)
  }
}
