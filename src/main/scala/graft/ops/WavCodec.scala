package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free 16-bit PCM WAV codec (pure JVM — the standard
  * 44-byte RIFF/fmt/data layout needs no audio library). The audio leg
  * of the multimodal seam: like [[BmpCodec]] for images, features are
  * computed from actually decoded samples.
  */
object WavCodec {

  val HeaderSize = 44

  /** Encode mono/interleaved 16-bit PCM samples as a standard WAV. */
  def encode(sampleRate: Int, channels: Int,
             samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                   // PCM fmt chunk size
    buf.putShort(1)                  // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                 // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decode to (sampleRate, channels, samples). Throws on anything
    * that isn't 16-bit PCM with the fmt chunk first.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= HeaderSize &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F',
      "not a RIFF/WAV")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val audioFormat = buf.getShort(20)
    val channels = buf.getShort(22).toInt
    val sampleRate = buf.getInt(24)
    val bps = buf.getShort(34)
    require(audioFormat == 1 && bps == 16,
      s"unsupported WAV: format=$audioFormat bps=$bps")
    val dataSize = buf.getInt(40)
    val n = math.min(dataSize, bytes.length - HeaderSize) / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(HeaderSize + i * 2); i += 1 }
    (sampleRate, channels, samples)
  }

  /** Duration of the payload in milliseconds. */
  def durationMs(bytes: Array[Byte]): Int = {
    val (rate, channels, samples) = decode(bytes)
    (samples.length.toLong * 1000 / (rate.toLong * channels)).toInt
  }

  /** RMS over the sample window [startMs, startMs + lenMs) — the
    * per-frame feature for frame-sampled pipelines, computed from the
    * actually decoded PCM (empty window -> 0).
    */
  def windowRms(bytes: Array[Byte], startMs: Long, lenMs: Int): Double = {
    val (rate, channels, s) = decode(bytes)
    val perMs = rate.toLong * channels / 1000.0
    val from = math.max(0, (startMs * perMs).toInt)
    val until = math.min(s.length, ((startMs + lenMs) * perMs).toInt)
    if (until <= from) return 0.0
    var sumSq = 0.0
    var i = from
    while (i < until) {
      val x = s(i) / 32768.0
      sumSq += x * x
      i += 1
    }
    math.sqrt(sumSq / (until - from))
  }

  /** Real audio features from decoded samples: [rms, zero-crossing
    * rate, mean |x|, peak] (normalized to [0,1]) + an energy-over-time
    * histogram filling the remaining dim-4 slots.
    */
  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    val (_, _, s) = decode(bytes)
    val out = new Array[Float](dim)
    if (s.isEmpty) return out
    val n = s.length
    var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0; var zc = 0
    val bins = math.max(1, dim - 4)
    val energy = new Array[Double](bins)
    var i = 0
    while (i < n) {
      val x = s(i) / 32768.0
      sumSq += x * x; sumAbs += math.abs(x)
      if (math.abs(x) > peak) peak = math.abs(x)
      if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
      energy(math.min(bins - 1, i * bins / n)) += x * x
      i += 1
    }
    if (dim > 0) out(0) = math.sqrt(sumSq / n).toFloat
    if (dim > 1) out(1) = zc.toFloat / n
    if (dim > 2) out(2) = (sumAbs / n).toFloat
    if (dim > 3) out(3) = peak.toFloat
    var k = 0
    while (dim > 4 && k < bins) {
      out(4 + k) = (energy(k) / math.max(sumSq, 1e-12)).toFloat
      k += 1
    }
    out
  }

  /** Goertzel single-bin spectral energy of `s[lo, hi)` at `freq` —
    * the O(n) per-band DFT probe (no FFT library needed; exact for
    * the fingerprint's relative comparisons).
    */
  private def goertzel(s: Array[Short], lo: Int, hi: Int,
                       freq: Double, sampleRate: Int): Double = {
    val coeff = 2.0 * math.cos(2.0 * math.Pi * freq / sampleRate)
    var s1 = 0.0; var s2 = 0.0
    var i = lo
    while (i < hi) {
      val s0 = s(i) / 32768.0 + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** 64-bit spectral fingerprint: 2 time frames × 32
    * geometrically-spaced Goertzel bands (150 Hz to ~3 kHz, ~10% band
    * width); bit set iff the band's energy exceeds its frame's MEAN
    * band energy. Relative-energy bits make the print invariant to
    * uniform gain (every band scales together, the comparison is
    * unchanged) and robust to low-level dither; the FINE band spacing
    * is what discriminates — tonal content a band apart flips bits.
    * 32 narrow bands beat 8 wide ones because near-stationary audio
    * repeats the same pattern in every time frame, so frame count
    * buys far less entropy than frequency resolution. The audio
    * analogue of the image dHash (mm04), and like it the narrow
    * no-shuffle first stage of near-dup detection: only 8-byte prints
    * ever reach [[Dedup.hammingBandPairs]].
    */
  def fingerprint64(bytes: Array[Byte]): Long = {
    val (sr, _, s) = decode(bytes)
    if (s.isEmpty) return 0L
    val frames = 2; val bands = 32
    var fp = 0L
    val e = new Array[Double](bands)
    var f = 0
    while (f < frames) {
      val lo = (s.length.toLong * f / frames).toInt
      val hi = (s.length.toLong * (f + 1) / frames).toInt
      var mean = 0.0
      var b = 0
      while (b < bands) {
        e(b) = goertzel(s, lo, hi, 150.0 * math.pow(1.1014, b), sr)
        mean += e(b)
        b += 1
      }
      mean /= bands
      b = 0
      while (b < bands) {
        if (e(b) > mean) fp |= 1L << (f * bands + b)
        b += 1
      }
      f += 1
    }
    fp
  }

  /** Deterministic gain + low-level dither mutation: scales every
    * sample and adds a hash-keyed triangular dither — byte-different
    * from the original (so exact dedup is blind to it) while keeping
    * relative band energies, hence the [[fingerprint64]], close.
    */
  def withGain(bytes: Array[Byte], gain: Double,
               ditherAmp: Int = 8): Array[Byte] = {
    val (sr, ch, s) = decode(bytes)
    var h = 1469598103934665603L
    val out = new Array[Short](s.length)
    var i = 0
    while (i < s.length) {
      h = (h ^ i) * 1099511628211L
      val dither = (math.floorMod(h, 2L * ditherAmp + 1)
        - ditherAmp).toInt
      val v = math.round(s(i) * gain).toInt + dither
      out(i) = math.max(Short.MinValue, math.min(Short.MaxValue, v)).toShort
      i += 1
    }
    encode(sr, ch, out)
  }

  /** Deterministic synthetic clip for a seed text: two-harmonic tone
    * with hash-keyed frequencies, amplitude, and length — the
    * dev-harness generator for real-decoder tests.
    */
  def synthesize(seedText: String, sampleRate: Int = 8000): Array[Byte] = {
    val hash = scala.util.hashing.MurmurHash3.stringHash(seedText)
    val n = 800 + math.floorMod(hash, 3200)
    val f1 = 100.0 + math.floorMod(hash >> 4, 900)
    val f2 = 1000.0 + math.floorMod(hash >> 13, 2000)
    val amp = 0.3 + math.floorMod(hash >> 21, 60) / 100.0
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / sampleRate
      val x = amp * (0.7 * math.sin(2 * math.Pi * f1 * t) +
        0.3 * math.sin(2 * math.Pi * f2 * t))
      samples(i) = (x * 32767).toShort
      i += 1
    }
    encode(sampleRate, 1, samples)
  }
}
