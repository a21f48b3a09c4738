package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM codecs for the two header-simple media formats — binary PPM
  * (P6) images and PCM-16 WAV audio. No external libraries: these are the
  * formats a container without codec packages can still decode for real,
  * so the multimodal pipeline has genuine decode/feature/resize operators
  * (video container parsing stays stubbed — see [[Multimodal]]).
  *
  * All functions are executor-side helpers called from mapPartitions:
  * plain byte-array in/out, no Spark types.
  */
object MediaCodecs {

  final case class PpmImage(width: Int, height: Int, rgb: Array[Byte])
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---- PPM (P6) ----

  def encodePpm(img: PpmImage): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3,
      s"rgb length ${img.rgb.length} != ${img.width}x${img.height}x3")
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** None when the payload is not a P6 PPM. */
  def decodePpm(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else going = false
      }
    }
    def readInt(): Int = {
      skipSpaceAndComments()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
        if (v > (1 << 28)) return -1 // absurd dimension ⇒ malformed, not a crash
      }
      if (!any) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxVal = readInt()
    if (w <= 0 || h <= 0 || maxVal != 255) return None
    pos += 1 // single whitespace after maxval
    // Long math: w*h*3 overflows Int for large declared dims, and a
    // negative n would slip past the length guard into copyOfRange
    val n = w.toLong * h * 3L
    if ((bytes.length - pos).toLong < n) return None
    val rgb = java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)
    Some(PpmImage(w, h, rgb))
  }

  /** Nearest-neighbour resize — a REAL pixel operation, not a metadata
    * plan.
    */
  def resizePpm(img: PpmImage, targetW: Int, targetH: Int): PpmImage = {
    val out = new Array[Byte](targetW * targetH * 3)
    var y = 0
    while (y < targetH) {
      val sy = y * img.height / targetH
      var x = 0
      while (x < targetW) {
        val sx = x * img.width / targetW
        val src = (sy * img.width + sx) * 3
        val dst = (y * targetW + x) * 3
        out(dst) = img.rgb(src); out(dst + 1) = img.rgb(src + 1); out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(targetW, targetH, out)
  }

  /** Per-channel means + 8-bin luminance histogram (normalized) = 11
    * floats.
    */
  def imageFeatures(img: PpmImage): Array[Float] = {
    val nPix = img.width * img.height
    val sums = new Array[Long](3)
    val hist = new Array[Long](8)
    var i = 0
    while (i < nPix) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      sums(0) += r; sums(1) += g; sums(2) += b
      val lum = (r * 299 + g * 587 + b * 114) / 1000
      hist(lum >> 5) += 1
      i += 1
    }
    val out = new Array[Float](11)
    var c = 0
    while (c < 3) { out(c) = sums(c).toFloat / nPix / 255f; c += 1 }
    var bin = 0
    while (bin < 8) { out(3 + bin) = hist(bin).toFloat / nPix; bin += 1 }
    out
  }

  // ---- WAV (RIFF, PCM 16-bit little-endian) ----

  def encodeWav(a: WavAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2) // byte rate
      .putShort((a.channels * 2).toShort)    // block align
      .putShort(16)                          // bits per sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** None when the payload is not a PCM-16 RIFF/WAVE. Walks chunks, so
    * extra chunks (LIST etc.) are tolerated.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, StandardCharsets.US_ASCII)
    }
    if (tag() != "RIFF") return None
    buf.getInt // riff size
    if (tag() != "WAVE") return None
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      val t = tag(); val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      t match {
        case "fmt " =>
          // declared size alone is not enough: a truncated fmt chunk
          // (size < 16) must be malformed-None, not BufferUnderflow /
          // a silent rewind that misparses the following chunks
          if (size < 16) return None
          val fmt = buf.getShort
          channels = buf.getShort
          rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort
          if (fmt != 1 || bits != 16) return None
          // clamp all skips: the odd-size pad byte may be absent on the
          // final chunk — walking past limit() must mean "end of chunks",
          // not an IllegalArgumentException out of a Spark task
          buf.position(math.min(buf.limit(), buf.position() + (size - 16) + (size & 1)))
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort; i += 1 }
          // an odd-sized data chunk leaves ONE unread data byte plus the
          // pad byte — skipping only the pad would land every following
          // chunk walk one byte short of its boundary
          buf.position(math.min(buf.limit(),
            buf.position() + (size - 2 * n) + (size & 1)))
        case _ =>
          buf.position(math.min(buf.limit(), buf.position() + size + (size & 1)))
      }
    }
    if (rate <= 0 || channels <= 0 || samples == null) None
    else Some(WavAudio(rate, channels, samples))
  }

  // ---- AVI (RIFF 'AVI ') video: MJPEG ('00dc') and raw RGB24 DIB
  // ('00db') frames ----
  //
  // The same chunk-walking discipline as decodeWav. MJPEG frames decode
  // through the JDK's built-in ImageIO JPEG reader (java.desktop ships
  // with the JVM — a real codec, no external packages); raw-DIB frames
  // are unpacked by hand (bottom-up, BGR, rows padded to 4 bytes, per the
  // public BITMAPINFOHEADER layout). Structure per the public AVI RIFF
  // form: RIFF('AVI ' LIST('hdrl' avih ...) LIST('movi' NNdc/NNdb...)).

  final case class AviVideo(width: Int, height: Int,
                            microSecPerFrame: Int,
                            frames: Vector[PpmImage]) {
    def fps: Float =
      if (microSecPerFrame <= 0) 0f else 1e6f / microSecPerFrame
  }

  /** JPEG bytes -> RGB pixels via the JDK's ImageIO (None on undecodable
    * input). Executor-side; headless-safe (no window toolkit touched).
    */
  def decodeJpeg(bytes: Array[Byte]): Option[PpmImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val o = (y * w + x) * 3
            rgb(o) = ((p >> 16) & 0xff).toByte
            rgb(o + 1) = ((p >> 8) & 0xff).toByte
            rgb(o + 2) = (p & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some(PpmImage(w, h, rgb))
      }
    } catch { case _: Exception => None }

  /** Raw RGB24 DIB frame (bottom-up, BGR, 4-byte-aligned rows) -> pixels. */
  private def decodeDibFrame(bytes: Array[Byte], w: Int, h: Int): Option[PpmImage] = {
    val stride = (w * 3 + 3) & ~3
    if (bytes.length < stride * h) return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = bytes(s + 2)     // B,G,R -> R,G,B
        rgb(d + 1) = bytes(s + 1)
        rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Some(PpmImage(w, h, rgb))
  }

  /** None when the payload is not a parseable AVI. Frames that fail to
    * decode are skipped (a video with zero decodable frames is None).
    */
  def decodeAvi(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, StandardCharsets.US_ASCII)
    }
    if (tag() != "RIFF") return None
    buf.getInt // riff size
    if (tag() != "AVI ") return None
    var w = -1; var h = -1; var uspf = -1
    val frames = Vector.newBuilder[PpmImage]
    def walkList(end: Int): Unit = {
      while (buf.position() + 8 <= end) {
        val t = tag(); val size = buf.getInt
        if (size < 0 || size > end - buf.position()) return
        val next = math.min(end, buf.position() + size + (size & 1))
        t match {
          case "LIST" =>
            // a LIST declaring size < 4 has no room for its kind tag —
            // reading it unguarded would BufferUnderflow out of the
            // "None when not parseable" contract; skip it as malformed
            if (size < 4) buf.position(next)
            else {
              val kind = tag() // consumes 4 of the size
              if (kind == "hdrl" || kind == "movi" || kind == "strl")
                walkList(buf.position() + size - 4)
              buf.position(next)
            }
          case "avih" =>
            if (size < 40) return
            uspf = buf.getInt
            buf.getInt; buf.getInt; buf.getInt; buf.getInt; buf.getInt
            buf.getInt; buf.getInt // frames..bufSize
            w = buf.getInt; h = buf.getInt
            buf.position(next)
          case fcc if fcc.length == 4 && fcc.substring(2) == "dc" =>
            val payload = new Array[Byte](size); buf.get(payload)
            decodeJpeg(payload).foreach(frames += _)
            buf.position(next)
          case fcc if fcc.length == 4 && fcc.substring(2) == "db" =>
            val payload = new Array[Byte](size); buf.get(payload)
            if (w > 0 && h > 0) decodeDibFrame(payload, w, h).foreach(frames += _)
            buf.position(next)
          case _ =>
            buf.position(next)
        }
      }
    }
    walkList(buf.limit())
    val fs = frames.result()
    if (w <= 0 || h <= 0 || fs.isEmpty) None
    else Some(AviVideo(w, h, uspf, fs))
  }

  /** Minimal AVI muxer (fixture/synthetic-corpus writer — the inverse of
    * [[decodeAvi]]): `jpeg = true` writes '00dc' MJPEG chunks, else raw
    * RGB24 '00db' DIB frames encoded from the given pixels.
    */
  def encodeAvi(width: Int, height: Int, microSecPerFrame: Int,
                frames: Seq[PpmImage], jpeg: Boolean): Array[Byte] = {
    def fourcc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
    def chunk(t: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      out.put(fourcc(t)).putInt(body.length).put(body)
      out.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ body)
    val frameBodies: Seq[Array[Byte]] = frames.map { f =>
      require(f.width == width && f.height == height, "frame dims mismatch")
      if (jpeg) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val o = (y * width + x) * 3
            img.setRGB(x, y, ((f.rgb(o) & 0xff) << 16) |
              ((f.rgb(o + 1) & 0xff) << 8) | (f.rgb(o + 2) & 0xff))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      } else {
        val stride = (width * 3 + 3) & ~3
        val dib = new Array[Byte](stride * height)
        var y = 0
        while (y < height) {
          val dstRow = (height - 1 - y) * stride
          var x = 0
          while (x < width) {
            val s = (y * width + x) * 3
            val d = dstRow + x * 3
            dib(d) = f.rgb(s + 2); dib(d + 1) = f.rgb(s + 1); dib(d + 2) = f.rgb(s)
            x += 1
          }
          y += 1
        }
        dib
      }
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put(fourcc("vids")).put(fourcc(if (jpeg) "MJPG" else "DIB "))
      .putInt(0).putInt(0).putInt(0)
      .putInt(microSecPerFrame).putInt(1000000) // scale/rate = fps
      .putInt(0).putInt(frames.size).putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      .array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .put(if (jpeg) fourcc("MJPG") else Array[Byte](0, 0, 0, 0))
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frameBodies.flatMap(b =>
      chunk(if (jpeg) "00dc" else "00db", b)).toArray)
    chunk("RIFF", fourcc("AVI ") ++ hdrl ++ movi)
  }

  /** n_frames, fps, duration_s, the 11 image features averaged over
    * frames, mean |Δ luminance| between consecutive frames (motion) = 15
    * floats.
    */
  def videoFeatures(v: AviVideo): Array[Float] = {
    val per = v.frames.map(imageFeatures)
    val avg = new Array[Float](11)
    per.foreach(f => { var i = 0; while (i < 11) { avg(i) += f(i); i += 1 } })
    var i = 0
    while (i < 11) { avg(i) /= v.frames.size; i += 1 }
    def lum(f: Array[Float]) = 0.299f * f(0) + 0.587f * f(1) + 0.114f * f(2)
    val motion =
      if (per.size < 2) 0f
      else per.sliding(2).map { case Seq(a, b) => math.abs(lum(b) - lum(a)) }
        .sum / (per.size - 1)
    Array(v.frames.size.toFloat, v.fps,
      if (v.fps == 0) 0f else v.frames.size / v.fps) ++ avg ++ Array(motion)
  }

  /** duration_s, rms, peak, zero-crossing rate = 4 floats (all on the
    * normalized [-1,1) signal).
    */
  def audioFeatures(a: WavAudio): Array[Float] = {
    val n = a.samples.length
    if (n == 0) return Array(0f, 0f, 0f, 0f)
    var sumSq = 0.0; var peak = 0.0; var crossings = 0L
    var prevNeg = a.samples(0) < 0
    var i = 0
    while (i < n) {
      val v = a.samples(i) / 32768.0
      sumSq += v * v
      val av = math.abs(v); if (av > peak) peak = av
      val neg = a.samples(i) < 0
      if (neg != prevNeg) { crossings += 1; prevNeg = neg }
      i += 1
    }
    Array(
      n.toFloat / a.channels / a.sampleRate,
      math.sqrt(sumSq / n).toFloat,
      peak.toFloat,
      crossings.toFloat / n)
  }
}
