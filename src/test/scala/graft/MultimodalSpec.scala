package graft

import org.apache.spark.sql.functions._

import graft.ops.{BmpCodec, Multimodal, WavCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.withFakeMedia(
    Seq((1L, "hello world"), (2L, "another doc")).toDF("doc_id", "text"),
    "text")

  test("withFakeMedia attaches binary payload and typed metadata") {
    val r = media.select($"media", $"meta.format", $"meta.width",
      $"meta.height", $"meta.duration_ms").collect()
    assert(r.forall(row => row.getAs[Array[Byte]](0).nonEmpty))
    assert(r.forall(_.getString(1) == "fake/raw"))
    assert(r.forall(_.getInt(2) >= 32))
  }

  test("extractFeatures yields fixed-dim deterministic vectors, batched") {
    import graft.ops.Multimodal.FakeCodec
    val f1 = Multimodal.extractFeatures(media, "media", dim = 8,
        batchSize = 1, codec = FakeCodec.features)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(media, "media", dim = 8,
        batchSize = 64, codec = FakeCodec.features)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(f1(1L).length == 8)
    assert(f1 == f2)            // batch shape must not change values
    assert(f1(1L) != f1(2L))    // content-sensitive
  }

  test("resize bounds the longer side, preserves other metadata") {
    val r = Multimodal.resize(media, maxSide = 64)
      .select($"meta.width", $"meta.height", $"meta.channels").collect()
    assert(r.forall(row => math.max(row.getInt(0), row.getInt(1)) <= 64))
    assert(r.forall(_.getInt(2) == 2))
  }

  test("BmpCodec: encode/decode round-trips pixels exactly") {
    import graft.ops.BmpCodec
    // 2x2 known image: red, green / blue, white
    val rgb = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val bytes = BmpCodec.encode(2, 2, rgb)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val (w, h, back) = BmpCodec.decode(bytes)
    assert(w == 2 && h == 2)
    assert(back.toSeq == rgb.toSeq)
    // features from real pixels: meanR = (255+0+0+255)/4/255 = 0.5
    val f = BmpCodec.features(bytes, 8)
    assert(math.abs(f(0) - 0.5f) < 1e-6 && math.abs(f(1) - 0.5f) < 1e-6 &&
      math.abs(f(2) - 0.5f) < 1e-6, f.toSeq.toString)
  }

  test("BmpCodec.resize bounds the longer side with real resampling") {
    import graft.ops.BmpCodec
    val rgb = Array.tabulate(30 * 10 * 3)(i => (i % 251).toByte)
    val resized = BmpCodec.resize(BmpCodec.encode(30, 10, rgb), 15)
    val (w, h, _) = BmpCodec.decode(resized)
    assert(w == 15 && h == 5, s"${w}x$h")
    // no-op when already within bounds
    val same = BmpCodec.resize(resized, 15)
    assert(same eq resized)
  }

  test("real BMP pipeline: synthesize -> resize -> features on pixels") {
    val docs = Seq((1L, "hello world"), (2L, "another doc"))
      .toDF("doc_id", "text")
    val m = Multimodal.withBmpMedia(docs, "text")
    val r = Multimodal.resizeDecoded(m, maxSide = 12)
    val f = Multimodal.extractFeatures(r, "media", dim = 8)
      .select($"doc_id", $"meta.width", $"meta.height", $"features")
      .as[(Long, Int, Int, Seq[Float])].collect()
    assert(f.length == 2)
    f.foreach { case (_, w, h, feats) =>
      assert(math.max(w, h) <= 12 && w >= 1 && h >= 1)
      assert(feats.length == 8)
      assert(feats.forall(v => v >= 0f && v <= 1f))
      // histogram bins (slots 4..7) sum to <= 1 and > 0 for real pixels
      val hsum = feats.drop(4).sum
      assert(hsum > 0f && hsum <= 1.0001f, s"hsum=$hsum")
    }
    assert(f(0)._4 != f(1)._4) // content-sensitive
  }

  test("WavCodec: encode/decode round-trips PCM samples exactly") {
    import graft.ops.WavCodec
    val samples = Array.tabulate(1000)(i =>
      (math.sin(i * 0.05) * 20000).toShort)
    val bytes = WavCodec.encode(8000, 1, samples)
    val (rate, ch, back) = WavCodec.decode(bytes)
    assert(rate == 8000 && ch == 1)
    assert(back.toSeq == samples.toSeq)
    assert(WavCodec.durationMs(bytes) == 125) // 1000 samples @ 8kHz
    // silence has zero features; a tone has rms > 0 and zcr ~ 2f/rate
    val f = WavCodec.features(bytes, 8)
    assert(f(0) > 0.3f && f(0) < 0.8f, s"rms=${f(0)}")
    assert(f(3) <= 1.0f)
    val silent = WavCodec.features(WavCodec.encode(8000, 1,
      new Array[Short](100)), 8)
    assert(silent(0) == 0f && silent(1) == 0f)
  }

  test("real WAV pipeline: synthesize -> features from decoded samples") {
    val docs = Seq((1L, "hello world"), (2L, "another doc"))
      .toDF("doc_id", "text")
    val m = Multimodal.withWavMedia(docs, "text")
    val f = Multimodal.extractFeatures(m, "media", dim = 8,
        codec = graft.ops.WavCodec.features)
      .select($"doc_id", $"meta.duration_ms", $"meta.channels", $"features")
      .as[(Long, Int, Int, Seq[Float])].collect()
    assert(f.length == 2)
    f.foreach { case (_, dur, ch, feats) =>
      assert(dur > 0 && ch == 1)
      assert(feats(0) > 0f)        // non-silent rms
      assert(feats(1) > 0f)        // tone crosses zero
      val esum = feats.drop(4).sum // energy profile normalized
      assert(esum > 0.9f && esum <= 1.0001f, s"esum=$esum")
    }
    assert(f(0)._4 != f(1)._4) // content-sensitive
  }

  test("frameSample emits one row per sampled timestamp") {
    val r = Multimodal.frameSample(media, everyMs = 10000)
      .groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("meta.duration_ms").as("d"))
      .as[(Long, Long, Int)].collect()
    r.foreach { case (_, n, d) =>
      assert(n == math.max(d - 1, 0) / 10000 + 1, s"n=$n d=$d")
    }
  }

  test("real frame pipeline: WAV durations + per-frame window RMS match " +
    "a direct decode") {
    import graft.ops.WavCodec
    val docs = Seq((1L, "alpha tone"), (2L, "another longer seed text"))
      .toDF("doc_id", "text")
    val m = Multimodal.withWavMedia(docs, "text")
    val frames = Multimodal.frameSample(m, everyMs = 100)
    val got = Multimodal.frameWindowRms(frames, "media", "frame_ms", 100)
      .select($"doc_id", $"frame_ms", $"win_rms")
      .as[(Long, Int, Double)].collect().toSeq
      .groupBy(_._1)
    Seq((1L, "alpha tone"), (2L, "another longer seed text")).foreach {
      case (id, text) =>
        val bytes = WavCodec.synthesize(text)
        val d = WavCodec.durationMs(bytes)
        val expFrames = (math.max(d - 1, 0) / 100) + 1
        val rows = got(id)
        assert(rows.length == expFrames,
          s"doc $id: ${rows.length} frames, expected $expFrames (d=$d)")
        rows.foreach { case (_, ms, rms) =>
          val exp = WavCodec.windowRms(bytes, ms.toLong, 100)
          assert(math.abs(rms - exp) < 1e-12, s"doc $id frame $ms")
          assert(rms > 0.0, s"tone window must be non-silent")
        }
    }
  }

  test("dHash: brightness-shift stays within budget, smooth resize " +
    "invariant, deterministic") {
    def img(i: Int) =
      BmpCodec.synthesize(s"sample doc $i words " + ("x" * (i % 17)))
    // identical bytes -> identical hash (determinism)
    assert(BmpCodec.dhash64(img(3)) == BmpCodec.dhash64(img(3)))
    // brightness shift preserves adjacent-cell luma ORDER wherever no
    // channel clamps — across the whole synthetic family the planted
    // mutation must stay within the mm04 Hamming budget (3)
    val bs = (0 until 500).map { i =>
      val b = img(i)
      val (w, h, rgb) = BmpCodec.decode(b)
      val brighter = rgb.map(x => math.min(255, (x & 0xff) + 10).toByte)
      java.lang.Long.bitCount(BmpCodec.dhash64(b) ^
        BmpCodec.dhash64(BmpCodec.encode(w, h, brighter)))
    }
    info(s"brightness hamming: max=${bs.max} mean=${bs.sum / 500.0}")
    assert(bs.max <= 3, s"brightness shift moved a hash ${bs.max} bits")
    // block-mean pooling survives downscale on smooth content: a
    // linear luma ramp keeps cell-mean ORDER exactly (the synthetic
    // gradient family with mod-256 wraparound is deliberately
    // adversarial for resampling, so the invariance is asserted on
    // the content class where it genuinely holds)
    val rampW = 63; val rampH = 48
    val ramp = Array.tabulate(rampW * rampH * 3) { j =>
      val x = (j / 3) % rampW
      (x * 255 / (rampW - 1)).toByte
    }
    val rampBmp = BmpCodec.encode(rampW, rampH, ramp)
    assert(BmpCodec.dhash64(rampBmp) ==
      BmpCodec.dhash64(BmpCodec.resize(rampBmp, 20)))
    // cross-image separation at the mm04 threshold: distinct images
    // from the (mutually similar by construction) gradient family
    // must almost never collide within 3 bits
    val sigs = (0 until 300).map(i => BmpCodec.dhash64(img(i)))
    var le3 = 0
    for (a <- 0 until 300; b <- a + 1 until 300)
      if (java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3) le3 += 1
    info(s"cross pairs of ${300 * 299 / 2}: le3=$le3")
    assert(le3 < 300 * 299 / 2 / 50, "cross-image hashes collapsed")
  }

  test("phash + hammingBandPairs recovers every planted brightness copy") {
    import graft.ops.Dedup
    val docs = (0 until 25)
      .map(i => (i.toLong, s"image seed $i " + ("y" * (i % 7))))
      .toDF("doc_id", "text")
    val base = Multimodal.withBmpMedia(docs, "text")
    val mutants = Multimodal.withBrightness(base, "media", delta = 10)
      .withColumn("doc_id", $"doc_id" + 1000)
    val sigs = Multimodal.phash(base.unionByName(mutants), "media")
      .select($"doc_id".as("id"), $"phash".as("sig"))
    val pairs = Dedup.hammingBandPairs(sigs, maxHamming = 3, tables = 8,
        maxBucket = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 25).foreach(i =>
      assert(pairs.contains((i.toLong, i + 1000L)),
        s"planted copy of $i not recovered"))
    // byte-level dedup CANNOT see these pairs — the perceptual hash's
    // reason to exist
    val fps = base.unionByName(mutants)
      .select(md5($"media").as("fp"), $"doc_id")
      .groupBy("fp").count().filter($"count" > 1).count()
    assert(fps == 0, "brightness copies should be byte-distinct")
  }

  test("audio fingerprint64: deterministic, gain-invariant within " +
      "budget, and discriminative across clips") {
    val clips = (0 until 200).map(i => WavCodec.synthesize(s"clip $i"))
    // deterministic
    assert(WavCodec.fingerprint64(clips(7)) ==
      WavCodec.fingerprint64(clips(7)))
    // gain 0.8 + dither: byte-different, fingerprint within the mm05
    // Hamming budget (relative band energies survive uniform gain)
    val hs = clips.map { c =>
      val m = WavCodec.withGain(c, 0.8)
      assert(!java.util.Arrays.equals(c, m))
      java.lang.Long.bitCount(WavCodec.fingerprint64(c) ^
        WavCodec.fingerprint64(m))
    }
    info(s"gain hamming: max=${hs.max} mean=${hs.sum / 200.0}")
    // uniform gain scales every band energy together, so the
    // relative-energy bits are EXACTLY preserved — budget 1, not the
    // image dHash's 3
    assert(hs.max <= 1, s"gain mutation moved a print ${hs.max} bits")
    // distinct tones must not collide: cross-pair distance stays high
    val prints = clips.map(WavCodec.fingerprint64)
    val close = (for {
      i <- prints.indices; j <- prints.indices if i < j
    } yield java.lang.Long.bitCount(prints(i) ^ prints(j)))
      .count(_ <= 1)
    val pairs = prints.size * (prints.size - 1) / 2
    info(s"cross-clip collisions <=1 bit: $close / $pairs")
    assert(close <= pairs / 100,
      s"$close of $pairs cross-pairs within 1 bit — not discriminative")
  }

  test("mm05 pipeline recovers planted gain-scaled audio copies that " +
      "byte dedup cannot see") {
    import graft.ops.Dedup
    val docs = (0 until 25)
      .map(i => (i.toLong, s"some audio doc number $i with tone"))
      .toDF("doc_id", "text")
    val base = Multimodal.withWavMedia(docs, "text")
    val mutants = Multimodal.withAudioGain(base, "media", gain = 0.8)
      .withColumn("doc_id", $"doc_id" + 1000)
    val sigs = Multimodal.audioFingerprint(base.unionByName(mutants),
        "media")
      .select($"doc_id".as("id"), $"afp".as("sig"))
    val pairs = Dedup.hammingBandPairs(sigs, maxHamming = 1, tables = 8,
        maxBucket = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 25).foreach(i =>
      assert(pairs.contains((i.toLong, i + 1000L)),
        s"planted audio copy of $i not recovered"))
    val fps = base.unionByName(mutants)
      .select(md5($"media").as("fp"), $"doc_id")
      .groupBy("fp").count().filter($"count" > 1).count()
    assert(fps == 0, "gain copies should be byte-distinct")
  }

  test("binaryFile ingestion is byte-identical to the in-memory media " +
    "pipeline; glob prunes non-images") {
    val texts = Seq((0L, "alpha doc"), (1L, "beta doc"), (2L, "gamma doc"))
    val dir = new java.io.File(
      TempDirs.createCleanedAtExit("graft-mm07-spec"))
    dir.mkdirs()
    texts.foreach { case (id, tx) =>
      java.nio.file.Files.write(
        new java.io.File(dir, s"doc_$id.bmp").toPath,
        BmpCodec.synthesize(tx))
    }
    java.nio.file.Files.write(
      new java.io.File(dir, "notes.txt").toPath, "junk".getBytes)
    val ingested = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp")
      .load(dir.getAbsolutePath)
      .select(regexp_extract($"path", "doc_(\\d+)\\.bmp$", 1)
        .cast("long").as("doc_id"), $"content".as("media"))
    // the straggler .txt never enters the scan
    assert(ingested.count() == 3)
    val viaFiles = Multimodal.extractFeatures(ingested, "media", dim = 8)
      .select($"doc_id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    val inMemory = Multimodal.extractFeatures(
        Multimodal.withBmpMedia(texts.toDF("doc_id", "text"), "text"),
        "media", dim = 8)
      .select($"doc_id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(viaFiles == inMemory,
      "file-ingested features must equal the column-borne pipeline")
  }
}
