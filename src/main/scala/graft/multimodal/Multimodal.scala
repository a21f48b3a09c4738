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
  * Image, audio AND video decode are REAL: [[MediaCodecs]] parses binary
  * PPM (P6), PCM-16 WAV, and AVI containers (MJPEG frames through the
  * JDK's built-in ImageIO JPEG codec, raw RGB24 DIB frames by hand) with
  * JVM-only code — features, pixel resize, and per-frame video features
  * operate on actual decoded samples. `stubDecode`'s deterministic
  * SHA-256 pseudo features remain only as the total-function fallback
  * for formats this container genuinely cannot parse (e.g. H.264).
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

  /** Deterministic synthetic media table (test/dev corpus): REAL encoded
    * payloads — PPM images with a per-id gradient, WAV sine-ish tones —
    * plus opaque bytes for the video rows.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val kinds = Seq("image", "audio", "video")
    spark.range(n.toLong).map { i =>
      val kind = kinds((i % 3).toInt)
      val w = (i % 8).toInt + 2
      val h = (i % 6).toInt + 2
      val payload = kind match {
        case "image" =>
          val rgb = Array.tabulate(w * h * 3)(p => ((p * 7 + i * 13) % 256).toByte)
          MediaCodecs.encodePpm(MediaCodecs.PpmImage(w, h, rgb))
        case "audio" =>
          val samples = Array.tabulate(1600)(s =>
            (math.sin(2 * math.Pi * (220 + i % 220) * s / 16000.0) * 16000).toShort)
          MediaCodecs.encodeWav(MediaCodecs.WavAudio(16000, 1, samples))
        case _ =>
          // real MJPEG-in-AVI payload: (i % 3) + 2 gradient frames
          val frames = (0 until (i % 3).toInt + 2).map { f =>
            val rgb = Array.tabulate(w * h * 3)(p => ((p * 5 + f * 31 + i * 13) % 256).toByte)
            MediaCodecs.PpmImage(w, h, rgb)
          }
          MediaCodecs.encodeAvi(w, h, 40000, frames, jpeg = true) // 25 fps
      }
      // meta.n_frames is TRUTHFUL per kind: it must match what the
      // encoded payload actually contains, or frame-indexed consumers
      // (sampleFrames idx paired with decodeAvi frames) walk off the end
      val nFrames = kind match {
        case "video" => (i % 3).toInt + 2 // == frames.length above
        case "audio" => 1600              // WAV frames == samples (mono)
        case _       => 1                 // a still image is one frame
      }
      (i, kind, payload, (w, h, 16000, nFrames))
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
    * (media_id, kind, codec, features array<float>) — codec records what
    * actually decoded (`ppm`/`wav`/`avi`/`stub`). Narrow — no shuffle;
    * each task decodes its own parquet split. Real decode first, SHA-256
    * stub fallback for formats this container can't parse.
    */
  def decodeFeatures(media: DataFrame, stubDim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("codec", StringType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          // the schema declares payload nullable (a failed fetch row):
          // treat null as empty bytes so the chain stays TOTAL and lands
          // in the stub branch instead of NPE-ing the task
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val (codec, feats) =
            MediaCodecs.decodePpm(payload)
              .map(img => "ppm" -> MediaCodecs.imageFeatures(img))
              .orElse(MediaCodecs.decodeWav(payload)
                .map(a => "wav" -> MediaCodecs.audioFeatures(a)))
              .orElse(MediaCodecs.decodeAvi(payload)
                .map(v => "avi" -> MediaCodecs.videoFeatures(v)))
              .getOrElse("stub" -> stubDecode(payload, stubDim))
          Row(r.getLong(0), r.getString(1), codec, feats.toSeq)
        }
      }
  }

  /** Payload-level image resize (nearest-neighbour on decoded pixels,
    * re-encoded as PPM; non-image payloads pass through unchanged).
    * Narrow, partition-wise — the real-pixel counterpart of
    * [[resizePlan]].
    */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("payload", BinaryType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // null payload (nullable by schema) passes through unchanged —
          // decodePpm(null) would NPE the task
          val out = if (payload == null) payload
          else MediaCodecs.decodePpm(payload) match {
            case Some(img) if img.width > maxSide || img.height > maxSide =>
              val scale = maxSide.toDouble / math.max(img.width, img.height)
              val tw = math.max(1, math.round(img.width * scale).toInt)
              val th = math.max(1, math.round(img.height * scale).toInt)
              MediaCodecs.encodePpm(MediaCodecs.resizePpm(img, tw, th))
            case _ => payload
          }
          Row(r.getLong(0), r.getString(1), out)
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
      // round + 1-floor, the SAME rule as resizeImages' pixel path — the
      // plan and the executed payload must agree on the target dims
      .withColumn("target_w",
        greatest(lit(1), round(col("meta.width") * col("scale"), 0)).cast("int"))
      .withColumn("target_h",
        greatest(lit(1), round(col("meta.height") * col("scale"), 0)).cast("int"))

  /** Deterministic frame sampling: every k-th frame index up to n_frames
    * (video path of the pipeline; explode keeps it relational).
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video" && col("meta.n_frames") > 0)
      // the n_frames > 0 guard: sequence(0, -1, +k) THROWS (illegal
      // boundaries) rather than yielding empty, so a corrupt/empty
      // container row would fail the stage instead of emitting nothing
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK)))
          .as("frame_idx"))

  /** Documents decorated into a media-shaped frame (the t10 decoration
    * convention — the synthetic corpus ships no binary columns): payload
    * = the document's UTF-8 bytes as `binary`, kind from `doc_id % 3`.
    * The DECODE path cannot take this route (payloads aren't real PPM/
    * WAV/AVI — MultimodalSpec pins that on exact encoded fixtures); what
    * this feeds is the payload PLUMBING every multimodal pipeline stage
    * shares: opaque-bytes column, length/digest accounting, fixed-size
    * chunking, every-k frame-sample arithmetic.
    */
  def mediaFromDocs(docsDf: DataFrame): DataFrame =
    docsDf.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"))

  /** Payload accounting over an opaque binary column — pure column math,
    * codegen'd, narrow (no shuffle): byte length, content digest,
    * `chunkBytes`-sized chunk count (the object-store read-batch unit),
    * and the every-`everyK`-th sampled-frame count over those chunks.
    */
  def payloadStats(media: DataFrame, chunkBytes: Int = 64,
      everyK: Int = 4): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("payload")).cast("bigint").as("byte_len"),
      md5(col("payload")).as("payload_md5"),
      expr(s"CAST((length(payload) + ${chunkBytes - 1}) DIV $chunkBytes AS BIGINT)")
        .as("n_chunks"))
      .withColumn("n_sampled",
        expr(s"CAST((n_chunks + ${everyK - 1}) DIV $everyK AS BIGINT)"))
      // no orderBy here: the op itself is narrow (pure column math); the
      // m01 gate wiring sorts for its oracle

  /** m01 — the multimodal family's driver gate. Decode itself is not
    * SQL-expressible (DuckDB has no PPM/WAV/AVI codec) and stays pinned
    * by MultimodalSpec's exact encode/decode fixtures; this gate puts
    * the family's relational surface under the oracle: binary payload
    * column, byte/digest accounting, chunk + frame-sample arithmetic.
    */
  val m01 = graft.QueryDef(
    "m01_media_meta",
    "multimodal payload plumbing: binary column, chunk + frame-sample math",
    (s, dir) => payloadStats(mediaFromDocs(graft.Tables.load(s, dir, "documents")))
      .orderBy(col("media_id")),
    Some("""SELECT doc_id AS media_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          ELSE 'video' END AS kind,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        md5(text) AS payload_md5,
        CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT) AS n_chunks,
        CAST(((octet_length(encode(text)) + 63) // 64 + 3) // 4 AS BIGINT)
          AS n_sampled
      FROM documents WHERE length(trim(text)) > 0 ORDER BY media_id"""))

  /** [[mediaFromDocs]] plus a deterministic synthetic `meta` struct (the
    * t10 decoration convention again — the corpus ships no real media
    * dimensions): width/height/n_frames derived from the payload byte
    * length by integer modulo, so the metadata-level ops ([[resizePlan]],
    * [[sampleFrames]]) have an oracle-replayable input. Ranges are chosen
    * so a 64-px resize target genuinely mixes scaled and pass-through
    * rows (width 16..214, height 16..142), and n_frames reuses m01's
    * chunk rule (chunks-as-frames stand-in).
    */
  def mediaMetaFromDocs(docsDf: DataFrame): DataFrame =
    mediaFromDocs(docsDf)
      .withColumn("byte_len", length(col("payload")).cast("bigint"))
      .withColumn("meta", struct(
        (col("byte_len") % 199 + 16).cast("int").as("width"),
        (col("byte_len") % 127 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        expr("CAST((byte_len + 63) DIV 64 AS INT)").as("n_frames")))
      .drop("byte_len")

  /** m02 — [[resizePlan]]'s aspect-preserving target geometry under the
    * oracle. The scale factor and rounding run as DOUBLE math in BOTH
    * engines in the same operation order (least of two divisions and 1.0,
    * multiply, round): IEEE doubles make the intermediate bit-identical,
    * and Spark's HALF_UP round agrees with DuckDB's away-from-zero round
    * for positive values, so the integer targets hash-match exactly.
    * Narrow plan — pure column math over the scan, no shuffle but the
    * gate's own ORDER BY.
    */
  val m02 = graft.QueryDef(
    "m02_resize_plan",
    "multimodal resize planning: aspect-preserving 64-px target dims",
    (s, dir) => resizePlan(
        mediaMetaFromDocs(graft.Tables.load(s, dir, "documents"))
          .filter(col("kind") === "image"), maxSide = 64)
      .select(col("media_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("target_w"), col("target_h"))
      .orderBy(col("media_id")),
    Some("""WITH m AS (SELECT doc_id AS media_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS bl
            FROM documents WHERE length(trim(text)) > 0 AND doc_id % 3 = 0),
      d AS (SELECT media_id, CAST(bl % 199 + 16 AS INT) AS width,
              CAST(bl % 127 + 16 AS INT) AS height FROM m),
      sc AS (SELECT *, least(64 / CAST(width AS DOUBLE),
                             64 / CAST(height AS DOUBLE), 1.0) AS scale
             FROM d)
      SELECT media_id, width, height,
        CAST(greatest(1, round(width * scale)) AS INT) AS target_w,
        CAST(greatest(1, round(height * scale)) AS INT) AS target_h
      FROM sc ORDER BY media_id"""))

  /** m03 — [[sampleFrames]]' every-k frame selection under the oracle:
    * the video rows explode `sequence(0, n_frames-1, 4)` (n_frames =
    * m01's chunk count standing in for the container's frame count).
    * The explode is the gate's only row expansion and is bounded by
    * n_frames/4 per video — the relational form a frame-level pipeline
    * stage (decode, embed, dedup) consumes downstream.
    */
  val m03 = graft.QueryDef(
    "m03_frame_sample",
    "multimodal frame sampling: every-4th frame index per video",
    (s, dir) => sampleFrames(
        mediaMetaFromDocs(graft.Tables.load(s, dir, "documents")), everyK = 4)
      .select(col("media_id"), col("frame_idx").cast("bigint").as("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx")),
    Some("""WITH m AS (SELECT doc_id AS media_id,
              CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT) AS nf
            FROM documents WHERE length(trim(text)) > 0 AND doc_id % 3 = 2)
      SELECT media_id, CAST(unnest(range(0, nf, 4)) AS BIGINT) AS frame_idx
      FROM m WHERE nf > 0 ORDER BY media_id, frame_idx"""))

  val all: Seq[graft.QueryDef] = Seq(m01, m02, m03)
}
