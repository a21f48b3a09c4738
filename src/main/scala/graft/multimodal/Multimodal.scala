package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support.
  *
  * Media are opaque `binary` payload columns plus a typed metadata struct
  * — the pattern that scales: payloads stay in parquet/object storage,
  * Spark moves only the bytes each stage needs, and decode/feature
  * extraction runs partition-wise so a 100 TB corpus streams through
  * executors in batches without driver involvement.
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): `decodeFeatures` derives a deterministic pseudo-feature
  * vector from the payload bytes via SHA-256 — the Spark-side plumbing
  * (schema, mapPartitions batching, encoder, partitioning) is real and
  * tested; swap `stubDecode` for a JNI/library call in production.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),          // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Deterministic synthetic media table (test/dev corpus). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val kinds = Seq("image", "audio", "video")
    spark.range(n.toLong).map { i =>
      val kind = kinds((i % 3).toInt)
      val payload = MessageDigest.getInstance("SHA-256")
        .digest(s"media-$i".getBytes(StandardCharsets.UTF_8))
      (i, kind, payload, ((i % 640).toInt + 1, (i % 480).toInt + 1,
        16000, (i % 100).toInt + 1))
    }.toDF("media_id", "kind", "payload", "meta")
      .withColumn("meta", col("meta").cast(mediaSchema("meta").dataType))
  }

  /** STUB decoder: payload bytes -> dim-length float feature vector.
    * Deterministic (SHA-256 expand) so tests can pin outputs. Replace the
    * body with the real codec; the signature/batching is the contract.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val md = MessageDigest.getInstance("SHA-256")
    val out = new Array[Float](dim)
    var block = md.digest(payload)
    var i = 0
    while (i < dim) {
      if (i % block.length == 0 && i > 0) block = md.digest(block)
      out(i) = (block(i % block.length).toInt & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-wise decode + feature extraction (the mapInPandas/Arrow
    * batch shape, Scala form: mapPartitions with a Row encoder). Emits
    * (media_id, kind, features array<float>). Narrow — no shuffle; each
    * task decodes its own parquet split.
    */
  def decodeFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val feats = stubDecode(r.getAs[Array[Byte]]("payload"), dim)
          Row(r.getLong(0), r.getString(1), feats.toSeq)
        }
      }
  }

  /** Metadata-level ops (no payload touch — pure column math, codegen'd):
    * resize target dims preserving aspect ratio; frame-sample selection.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.withColumn("scale",
        least(lit(maxSide) / col("meta.width"), lit(maxSide) / col("meta.height"),
          lit(1.0)))
      .withColumn("target_w", ceil(col("meta.width") * col("scale")).cast("int"))
      .withColumn("target_h", ceil(col("meta.height") * col("scale")).cast("int"))

  /** Deterministic frame sampling: every k-th frame index up to n_frames
    * (video path of the pipeline; explode keeps it relational).
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK)))
          .as("frame_idx"))
}
