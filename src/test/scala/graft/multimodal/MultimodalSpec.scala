package graft.multimodal

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with graft.SparkTestSession {

  test("synthetic media has the declared schema and mixed kinds") {
    val m = Multimodal.syntheticMedia(spark, 30)
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeFeatures: real ppm/wav/avi decode, stub only for unknowns, narrow") {
    import spark.implicits._
    val m = Multimodal.syntheticMedia(spark, 20).repartition(5)
    val f1 = Multimodal.decodeFeatures(m, stubDim = 16)
    val rows = f1.collect()
    assert(rows.length == 20)
    // image -> ppm (11 features), audio -> wav (4), video -> avi (15)
    rows.foreach { r =>
      val (kind, codec, n) = (r.getString(1), r.getString(2),
        r.getAs[Seq[Float]]("features").length)
      kind match {
        case "image" => assert(codec == "ppm" && n == 11, s"$kind/$codec/$n")
        case "audio" => assert(codec == "wav" && n == 4, s"$kind/$codec/$n")
        case _       => assert(codec == "avi" && n == 15, s"$kind/$codec/$n")
      }
    }
    // determinism across runs
    val f2 = Multimodal.decodeFeatures(m, stubDim = 16).collect()
    val m1 = rows.map(r => r.getLong(0) -> r.getAs[Seq[Float]]("features")).toMap
    val m2 = f2.map(r => r.getLong(0) -> r.getAs[Seq[Float]]("features")).toMap
    assert(m1 == m2)
    // no shuffle: decode is narrow
    assert(f1.rdd.getNumPartitions == 5)
    // a payload no codec recognizes still flows through (stub fallback)
    val junk = Seq((99L, "video", "h264???".getBytes))
      .toDF("media_id", "kind", "payload")
    val sr = Multimodal.decodeFeatures(junk, stubDim = 16).collect()(0)
    assert(sr.getString(2) == "stub" && sr.getSeq[Float](3).length == 16)
  }

  test("avi codec: raw-DIB round-trip exact, MJPEG real decode, malformed -> None") {
    // two 4x2 frames with known pixels: frame 0 all red, frame 1 all blue
    def flat(r: Int, g: Int, b: Int) =
      Array.tabulate(4 * 2 * 3)(p => (p % 3 match {
        case 0 => r; case 1 => g; case 2 => b
      }).toByte)
    val frames = Seq(MediaCodecs.PpmImage(4, 2, flat(255, 0, 0)),
      MediaCodecs.PpmImage(4, 2, flat(0, 0, 255)))

    // raw RGB24 DIB frames: bit-exact round trip through the container
    val rawAvi = MediaCodecs.encodeAvi(4, 2, 40000, frames, jpeg = false)
    val v = MediaCodecs.decodeAvi(rawAvi).get
    assert(v.width == 4 && v.height == 2 && v.frames.size == 2)
    assert(math.abs(v.fps - 25f) < 1e-4)
    assert(v.frames(0).rgb.toSeq == frames(0).rgb.toSeq)
    assert(v.frames(1).rgb.toSeq == frames(1).rgb.toSeq)
    // features exact on the known pixels: 2 frames, 25 fps, 0.08 s,
    // mean r/g/b = (1+0)/2, (0+0)/2, (0+1)/2
    val vf = MediaCodecs.videoFeatures(v)
    assert(vf(0) == 2f && math.abs(vf(1) - 25f) < 1e-4)
    assert(math.abs(vf(2) - 0.08f) < 1e-6)
    assert(math.abs(vf(3) - 0.5f) < 1e-6 && vf(4) == 0f &&
      math.abs(vf(5) - 0.5f) < 1e-6)
    // motion: |lum(blue) - lum(red)| = |0.114 - 0.299| * 1.0
    assert(math.abs(vf(14) - 0.185f) < 1e-3)

    // MJPEG path: the JDK's ImageIO codec decodes what it encoded;
    // JPEG is lossy so compare approximately, and determinism exactly
    val mjpeg = MediaCodecs.encodeAvi(4, 2, 40000, frames, jpeg = true)
    val vj = MediaCodecs.decodeAvi(mjpeg).get
    assert(vj.frames.size == 2 && vj.width == 4 && vj.height == 2)
    val red0 = vj.frames(0).rgb(0) & 0xff
    assert(red0 > 200, s"jpeg red channel came back $red0")
    val vj2 = MediaCodecs.decodeAvi(mjpeg).get
    assert(MediaCodecs.videoFeatures(vj).toSeq ==
      MediaCodecs.videoFeatures(vj2).toSeq)

    // malformed payloads are None, not exceptions
    assert(MediaCodecs.decodeAvi("RIFFxxxxAVI corrupt".getBytes).isEmpty)
    assert(MediaCodecs.decodeAvi(Array[Byte](82, 73, 70, 70)).isEmpty)
    assert(MediaCodecs.decodeAvi(rawAvi.take(40).toArray).isEmpty)
    // truncated mid-movi: decodable prefix may yield frames or None,
    // but must not throw
    MediaCodecs.decodeAvi(rawAvi.dropRight(7).toArray)

    // a LIST chunk declaring size 0 at end-of-buffer has no room for its
    // kind tag: must be treated as malformed, not BufferUnderflow
    val tinyList = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tinyList.put("RIFF".getBytes).putInt(12).put("AVI ".getBytes)
      .put("LIST".getBytes).putInt(0)
    assert(MediaCodecs.decodeAvi(tinyList.array()).isEmpty)
  }

  test("wav codec: odd-sized data chunk stays aligned for following chunks") {
    // data size 3 = one 16-bit sample + one odd remainder byte + one pad
    // byte; the walk must consume all of them or the trailing LIST tag
    // reads one byte short and a fully-parsed file comes back None
    val b = java.nio.ByteBuffer.allocate(12 + 24 + 8 + 4 + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(3)
      .putShort(1234).put(7.toByte).put(0.toByte) // sample, odd byte, pad
    b.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    val got = MediaCodecs.decodeWav(b.array())
    assert(got.isDefined, "odd data chunk misaligned the walk")
    assert(got.get.sampleRate == 8000 && got.get.channels == 1)
    assert(got.get.samples.toSeq == Seq(1234.toShort))
  }

  test("null payloads fall to the stub/passthrough paths, not NPE") {
    import spark.implicits._
    val img = MediaCodecs.PpmImage(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    val df = Seq(
      (1L, "image", null.asInstanceOf[Array[Byte]]),
      (2L, "image", MediaCodecs.encodePpm(img)))
      .toDF("media_id", "kind", "payload")
    val codecs = Multimodal.decodeFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(codecs(1L) == "stub" && codecs(2L) == "ppm")
    val resized = Multimodal.resizeImages(df, 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(resized(1L) == null)          // null passes through unchanged
    assert(resized(2L) != null)
  }

  test("codecs: ppm and wav round-trip; features are exact on known fixtures") {
    // 2x1 image: black pixel + white pixel
    val img = MediaCodecs.PpmImage(2, 1,
      Array[Byte](0, 0, 0, -1, -1, -1)) // (0,0,0) and (255,255,255)
    val back = MediaCodecs.decodePpm(MediaCodecs.encodePpm(img)).get
    assert(back.width == 2 && back.height == 1 && back.rgb.toSeq == img.rgb.toSeq)
    val feats = MediaCodecs.imageFeatures(back)
    assert(math.abs(feats(0) - 0.5f) < 1e-6) // mean r = (0+255)/2/255
    assert(feats(3) == 0.5f && feats(10) == 0.5f) // lum bins 0 and 7

    // square wave at half amplitude: rms = 0.5, peak = 0.5; zcr ≈ 0.999
    // (alternating signs cross zero between EVERY consecutive pair)
    val wav = MediaCodecs.WavAudio(8000, 1,
      Array.tabulate(1000)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort))
    val wback = MediaCodecs.decodeWav(MediaCodecs.encodeWav(wav)).get
    assert(wback.sampleRate == 8000 && wback.samples.toSeq == wav.samples.toSeq)
    val af = MediaCodecs.audioFeatures(wback)
    assert(math.abs(af(0) - 0.125f) < 1e-6) // 1000 samples / 8000 Hz
    assert(math.abs(af(1) - 0.5f) < 1e-3 && math.abs(af(2) - 0.5f) < 1e-3)
    assert(math.abs(af(3) - 0.999f) < 2e-3) // alternating signs

    // garbage bytes decode as neither
    assert(MediaCodecs.decodePpm("not an image".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav("not audio at all padded to 44+ bytes....".getBytes).isEmpty)
  }

  test("resizeImages: pixels actually resized, nearest-neighbour exact") {
    import spark.implicits._
    // 4x2 image: left half red, right half blue -> resized 2x1 = (red, blue)
    val rgb = Array.tabulate(4 * 2 * 3) { p =>
      val x = (p / 3) % 4
      val c = p % 3
      if (x < 2) (if (c == 0) -1 else 0).toByte else (if (c == 2) -1 else 0).toByte
    }
    val payload = MediaCodecs.encodePpm(MediaCodecs.PpmImage(4, 2, rgb))
    val df = Seq((1L, "image", payload)).toDF("media_id", "kind", "payload")
    val out = Multimodal.resizeImages(df, maxSide = 2).collect()(0)
    val img = MediaCodecs.decodePpm(out.getAs[Array[Byte]]("payload")).get
    assert(img.width == 2 && img.height == 1)
    val px = img.rgb.map(_ & 0xff).toSeq
    assert(px == Seq(255, 0, 0, 0, 0, 255), px.toString) // red, blue
  }

  test("resizePlan preserves aspect ratio and caps the long side") {
    // maxSide = 4 is BELOW most synthetic dims (2..9 x 2..7) so the
    // scaling arithmetic is actually exercised — with a cap larger than
    // every input the assertions would pass vacuously
    val m = Multimodal.syntheticMedia(spark, 10)
    val r = Multimodal.resizePlan(m, maxSide = 4).collect()
    var scaledRows = 0
    r.foreach { row =>
      val (w, h) = (row.getAs[Row]("meta").getAs[Int]("width"),
        row.getAs[Row]("meta").getAs[Int]("height"))
      val (tw, th) = (row.getAs[Int]("target_w"), row.getAs[Int]("target_h"))
      if (math.max(w, h) <= 4) {
        assert((tw, th) == ((w, h)), s"no upscale for ${w}x$h")
      } else {
        scaledRows += 1
        assert(math.max(tw, th) == 4, s"long side ${w}x$h -> ${tw}x$th")
        // half-up rounding keeps the short side within half a pixel
        val exact = math.min(w, h) * 4.0 / math.max(w, h)
        assert(math.abs(math.min(tw, th) - exact) <= 0.5, s"${w}x$h -> ${tw}x$th")
      }
    }
    assert(scaledRows > 0, "fixture must contain rows that actually scale")
  }

  test("resizePlan target dims EQUAL what resizeImages actually produces") {
    import spark.implicits._
    // both paths share the round + 1-floor rule; a plan/payload dim
    // mismatch (the old ceil-vs-round split) breaks any pipeline that
    // plans storage from the metadata and executes on the pixels
    val m = Multimodal.syntheticMedia(spark, 30).filter(col("kind") === "image")
    val planned = Multimodal.resizePlan(m, maxSide = 3)
      .select("media_id", "target_w", "target_h").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    Multimodal.resizeImages(m, maxSide = 3).collect().foreach { r =>
      val img = MediaCodecs.decodePpm(r.getAs[Array[Byte]]("payload")).get
      assert((img.width, img.height) == planned(r.getLong(0)),
        s"media ${r.getLong(0)}: payload ${img.width}x${img.height} vs plan ${planned(r.getLong(0))}")
    }
  }

  test("meta.n_frames matches the frames actually encoded in the payload") {
    val m = Multimodal.syntheticMedia(spark, 12).collect()
    m.filter(_.getString(1) == "video").foreach { r =>
      val declared = r.getAs[Row]("meta").getAs[Int]("n_frames")
      val actual = MediaCodecs.decodeAvi(r.getAs[Array[Byte]]("payload")).get
        .frames.length
      assert(declared == actual, s"media ${r.getLong(0)}: meta $declared vs avi $actual")
    }
  }

  test("sampleFrames yields no rows (not a crash) for n_frames = 0") {
    import spark.implicits._
    // sequence(0, -1, +k) throws on illegal boundaries without the guard
    val df = Seq((7L, "video", (2, 2, 0, 0)))
      .toDF("media_id", "kind", "meta")
      .withColumn("meta", col("meta").cast(
        Multimodal.mediaSchema("meta").dataType))
    assert(Multimodal.sampleFrames(df, everyK = 2).count() == 0L)
  }

  test("sampleFrames emits every k-th frame for videos only") {
    val m = Multimodal.syntheticMedia(spark, 12)
    val s = Multimodal.sampleFrames(m, everyK = 7)
    val byId = s.collect().groupBy(_.getLong(0))
    assert(byId.nonEmpty)
    byId.values.foreach { frames =>
      val idxs = frames.map(_.getAs[Int]("frame_idx")).sorted
      assert(idxs.head == 0 && idxs.forall(_ % 7 == 0))
    }
  }

  test("m01 payloadStats: UTF-8 byte accounting and chunk/sample ceilings") {
    import spark.implicits._
    // "é" is 2 UTF-8 bytes: byte_len counts bytes, not characters.
    // 130 bytes / 64-byte chunks -> 3 chunks; every-4th of 3 -> 1 sample.
    val d = Seq(
      (0L, "é" * 65),            // 130 bytes -> 3 chunks, 1 sampled
      (1L, "a" * 64),            // exactly one chunk
      (2L, "b" * 257),           // 5 chunks -> ceil(5/4) = 2 sampled
      (3L, "   ")                // blank: excluded
    ).toDF("doc_id", "text")
    // sort locally: payloadStats is narrow and no longer orders (the m01
    // gate wiring adds the orderBy its oracle needs)
    val got = Multimodal.payloadStats(Multimodal.mediaFromDocs(d))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(4), r.getLong(5))).toList.sortBy(_._1)
    assert(got == List(
      (0L, "image", 130L, 3L, 1L),
      (1L, "audio", 64L, 1L, 1L),
      (2L, "video", 257L, 5L, 2L)))
    // digest is over the payload BYTES — matches a driver-side md5
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(("a" * 64).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val row1 = Multimodal.payloadStats(Multimodal.mediaFromDocs(d))
      .filter($"media_id" === 1L).collect().head
    assert(row1.getString(3) == md5hex)
  }

  test("m02 core: synthetic meta dims + resize targets, hand-computed") {
    import spark.implicits._
    // doc_id % 3 == 0 -> image. byte_len 150: width = 150%199+16 = 166,
    // height = 150%127+16 = 39; scale = 64/166; targets
    // (round(166*64/166)=64, round(39*64/166)=round(15.0361...)=15).
    // byte_len 10: dims (26, 26) both <= 64 -> scale 1.0, pass-through.
    val d = Seq((0L, "x" * 150), (3L, "y" * 10)).toDF("doc_id", "text")
    val got = Multimodal.resizePlan(
        Multimodal.mediaMetaFromDocs(d).filter($"kind" === "image"), maxSide = 64)
      .select($"media_id", $"meta.width", $"meta.height", $"target_w", $"target_h")
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got == Map(
      0L -> ((166, 39, 64, 15)),
      3L -> ((26, 26, 26, 26))), s"got=$got")
  }

  test("m03 core: every-4th frame over the chunk-count frame stand-in") {
    import spark.implicits._
    // doc_id % 3 == 2 -> video. 150 bytes -> 3 chunks/frames -> idx [0];
    // 400 bytes -> 7 frames -> [0, 4]. Image row contributes nothing.
    val d = Seq((2L, "a" * 150), (5L, "b" * 400), (0L, "c" * 999))
      .toDF("doc_id", "text")
    val got = Multimodal.sampleFrames(
        Multimodal.mediaMetaFromDocs(d), everyK = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((2L, 0), (5L, 0), (5L, 4)), s"got=$got")
  }
}
