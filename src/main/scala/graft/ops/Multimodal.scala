package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode/feature-extract as
  * batched partition-local transforms.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the actual media decoding is STUBBED with a
  * deterministic fake (this container ships no image/audio codecs) —
  * swap [[FakeCodec]] for a real decoder without touching the plumbing.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("channels", IntegerType)))

  /** STUB decoder: deterministic bytes -> fixed-dim float feature
    * vector via a rolling hash (a real impl would JPEG-decode +
    * pool). Marked fake on purpose; everything around it is real.
    */
  object FakeCodec {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = 31 * h + bytes(i)
        out(math.floorMod(i, dim)) += (h % 1000L) / 1000.0f
        i += 1
      }
      out
    }

    /** "Resize": recompute metadata only (bytes pass through). */
    def resizeMeta(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
      (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
    }
  }

  /** Attach a fake media payload + metadata to any table (test/dev
    * harness for the pipeline; production reads real binary columns).
    */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        lit("fake/raw").as("format"),
        (pmod(xxhash64(col(textCol)), lit(1920L)).cast("int") + 32)
          .as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1080L)).cast("int") + 32)
          .as("height"),
        (pmod(xxhash64(col(textCol), lit(2)), lit(60000L)).cast("int"))
          .as("duration_ms"),
        lit(2).as("channels")))

  /** Feature extraction over the binary column: batched, partition-
    * local, no shuffle. Batches bound peak memory per task the way
    * arrow-batched decoders do; `dim` fixes the output schema.
    */
  def extractFeatures(df: DataFrame, binaryCol: String, dim: Int,
                      batchSize: Int = 64, as: String = "features"): DataFrame = {
    val outSchema = df.schema.add(as, ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          val feats =
            if (bytes == null) new Array[Float](dim)
            else FakeCodec.features(bytes, dim)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }

  /** Metadata-level resize: recompute width/height bounded by
    * `maxSide`, keep bytes (decode stubbed). Pure Column ops.
    */
  def resize(df: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h))
    df.withColumn("meta", struct(
      col("meta.format").as("format"),
      greatest(lit(1), (w * scale).cast("int")).as("width"),
      greatest(lit(1), (h * scale).cast("int")).as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.channels").as("channels")))
  }

  /** Frame sampling plan for video-ish media: one row per sampled
    * frame timestamp (every `everyMs`), via sequence+explode — the
    * generate pattern that scales (no driver loop, no UDF).
    */
  def frameSample(df: DataFrame, everyMs: Int): DataFrame =
    df.withColumn("frame_ms",
      explode(sequence(lit(0), greatest(col("meta.duration_ms") - 1, lit(0)),
        lit(everyMs))))
}
