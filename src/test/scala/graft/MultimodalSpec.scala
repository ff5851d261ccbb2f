package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

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
    val f1 = Multimodal.extractFeatures(media, "media", dim = 8, batchSize = 1)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.extractFeatures(media, "media", dim = 8, batchSize = 64)
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

  test("frameSample emits one row per sampled timestamp") {
    val r = Multimodal.frameSample(media, everyMs = 10000)
      .groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("meta.duration_ms").as("d"))
      .as[(Long, Long, Int)].collect()
    r.foreach { case (_, n, d) =>
      assert(n == math.max(d - 1, 0) / 10000 + 1, s"n=$n d=$d")
    }
  }
}
