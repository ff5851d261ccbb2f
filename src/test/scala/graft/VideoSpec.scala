package graft

import org.apache.spark.sql.functions._

import graft.ops.{BmpCodec, Multimodal, VideoCodec}

/** Video-container gates: the GVID codec must round-trip exactly, and
  * the frame-sampling + shot-detection pipeline must recover the
  * planted scene structure from actually-decoded pixels.
  */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("GVID round-trips frames byte-exactly and rejects bad magic") {
    val frames = Seq("a", "bb", "ccc").map(BmpCodec.synthesize)
    val enc = VideoCodec.encode(frames, frameMs = 40)
    val (ms, dec) = VideoCodec.decode(enc)
    assert(ms == 40 && dec.length == 3)
    frames.zip(dec).foreach { case (f, d) =>
      assert(java.util.Arrays.equals(f, d))
    }
    assert(VideoCodec.frameCount(enc) == 3)
    intercept[IllegalArgumentException] {
      VideoCodec.decode("notavideo!".getBytes)
    }
  }

  test("synthesize plants a hard cut; within-scene drift stays inside " +
      "dHash's brightness budget") {
    val clip = VideoCodec.synthesize("spec-clip", nFrames = 8, cutAt = 4)
    val (_, frames) = VideoCodec.decode(clip)
    val hashes = frames.map(BmpCodec.dhash64)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // consecutive within-scene frames: small distance (drift only)
    (0 until 3).foreach(i =>
      assert(ham(hashes(i), hashes(i + 1)) <= 6,
        s"drift at $i: ${ham(hashes(i), hashes(i + 1))}"))
    (4 until 7).foreach(i =>
      assert(ham(hashes(i), hashes(i + 1)) <= 6))
    // the cut: far apart
    assert(ham(hashes(3), hashes(4)) > 12,
      s"cut distance ${ham(hashes(3), hashes(4))}")
  }

  test("videoFrames honors the sampling stride and the mm06 pipeline " +
      "recovers the planted shot structure for most clips") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").limit(100)
    val vids = Multimodal.withVideoMedia(docs, "text", "doc_id")
    val frames = Multimodal.videoFrames(vids, "media", every = 2)
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        collect_set("frame_idx").as("idxs"))
      .select($"n", $"idxs").as[(Long, Seq[Int])].collect()
    assert(perDoc.forall(_._1 == 4))
    assert(perDoc.forall(_._2.toSet == Set(0, 2, 4, 6)))
    val shots = graft.SparkEntry
      .queries("mm06_video_shots")(spark, sf001)
      .select($"n_shots").as[Long].collect()
    // scene B is scene A's photometric inverse (near-64-bit dHash
    // jump), so the single planted cut must be found in every clip
    // except degenerate near-flat patterns — gate at 99%
    val ok = shots.count(_ == 2).toDouble / shots.length
    assert(ok >= 0.99, s"planted-cut recovery rate $ok")
  }
}
