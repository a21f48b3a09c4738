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
          buf.position(math.min(buf.limit(), buf.position() + (size & 1)))
        case _ =>
          buf.position(math.min(buf.limit(), buf.position() + size + (size & 1)))
      }
    }
    if (rate <= 0 || channels <= 0 || samples == null) None
    else Some(WavAudio(rate, channels, samples))
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
