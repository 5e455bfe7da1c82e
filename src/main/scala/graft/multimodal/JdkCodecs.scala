package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** REAL media codecs built entirely on JDK-standard APIs — no external
  * libraries: `javax.imageio` decodes/encodes PNG/BMP/GIF/JPEG,
  * `javax.sound.sampled` decodes/encodes WAV/PCM, and the video path
  * parses MJPEG (a RIFF/AVI container whose `movi` chunks are plain
  * JPEG frames, or a bare concatenated-JPEG stream) on top of the
  * image decoder. Inter-frame codecs (H.264 etc.) remain out of JDK
  * reach — at scale that call is an executor-local ffmpeg/native
  * invocation with the same bytes-in/frames-out shape.
  *
  * Everything here is executor-local per-row compute: no shuffle, no
  * driver involvement, arbitrary horizontal scale.
  */
object JdkCodecs {

  // ImageIO defaults to a DISK-backed stream cache: every encode and
  // decode creates, seeks and deletes a temp file (thread dumps of the
  // multimodal gates showed tasks inside FileCacheImageOutputStream).
  // The media here are row-sized byte arrays already in memory — cache
  // in memory instead. JVM-wide, set once when the object loads on
  // each executor.
  ImageIO.setUseCache(false)

  // ------------------------------------------------------------------
  // Images

  /** Decode compressed image bytes (PNG/BMP/GIF/JPEG). Null-safe:
    * undecodable bytes → None, so a corrupt shard never kills a task. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Bilinear resize to (w, h). */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 8-dim image feature vector:
    * [width, height, meanR, meanG, meanB, meanLuma, lumaVariance,
    * meanEdgeMagnitude] — the cheap statistics a curation pipeline
    * filters on (brightness/contrast/blank-image detection) before any
    * model-based embedding. One pass over the pixels. */
  def imageFeatures(img: BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    // one bulk getRGB: identical ARGB conversion to the per-pixel
    // call, without a color-model dispatch per pixel (JPEG decodes
    // arrive as TYPE_3BYTE_BGR, where getRGB(x,y) converts per call)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0; var se = 0.0
    var prevLuma = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b
        sl += luma; sl2 += luma * luma
        if (x > 0) se += math.abs(luma - prevLuma)
        prevLuma = luma
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val meanL = sl / n
    Array(w.toFloat, h.toFloat, (sr / n).toFloat, (sg / n).toFloat,
      (sb / n).toFloat, meanL.toFloat, (sl2 / n - meanL * meanL).toFloat,
      (se / math.max(1.0, n - h)).toFloat)
  }

  // ------------------------------------------------------------------
  // Audio (WAV / PCM via javax.sound.sampled)

  /** Decode WAV bytes → (sampleRate, mono float samples in [-1, 1]).
    * Handles 8/16-bit PCM; averages channels to mono. */
  def decodeWav(bytes: Array[Byte]): Option[(Float, Array[Float])] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      // only the layouts the sample loop actually decodes: 16-bit
      // signed little-endian PCM, or 8-bit unsigned PCM. Anything else
      // AudioSystem parses (float/24-bit/ULAW/big-endian AIFF) must
      // yield None, not silently-garbled samples that pass curation.
      val enc = fmt.getEncoding
      val okFmt =
        (fmt.getSampleSizeInBits == 16 &&
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          !fmt.isBigEndian) ||
        (fmt.getSampleSizeInBits == 8 &&
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
      if (!okFmt) return None
      val data = in.readAllBytes()
      val ch = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val bytesPerFrame = fmt.getFrameSize
      val nFrames = data.length / bytesPerFrame
      val mono = new Array[Float](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0.0f
        var c = 0
        while (c < ch) {
          val off = f * bytesPerFrame + c * (bits / 8)
          val v =
            if (bits == 16) {
              val lo = data(off) & 0xff
              val hi = data(off + 1)
              ((hi << 8) | lo).toShort / 32768.0f
            } else (data(off) & 0xff) / 128.0f - 1.0f // 8-bit unsigned
          acc += v
          c += 1
        }
        mono(f) = acc / ch
        f += 1
      }
      Some((fmt.getSampleRate, mono))
    } catch { case _: Exception => None }

  /** Encode mono float samples in [-1, 1] as 16-bit PCM WAV bytes. */
  def encodeWav(sampleRate: Float, samples: Array[Float]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0f, math.min(1.0f, samples(i)))
      val s = math.round(v * 32767.0f).toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 8-dim audio feature vector:
    * [sampleRate, nSamples, rms, peak, zeroCrossingRate, meanAbs,
    * clipFraction, dcOffset] — the silence/clipping/quality gates an
    * audio curation pipeline applies before transcription. */
  def audioFeatures(sampleRate: Float, samples: Array[Float]): Array[Float] = {
    var s2 = 0.0; var peak = 0.0; var zc = 0; var sa = 0.0
    var clip = 0; var sum = 0.0
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      s2 += v * v; sa += math.abs(v); sum += v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (math.abs(v) > 0.985) clip += 1
      if (i > 0 && (samples(i - 1) >= 0) != (v >= 0)) zc += 1
      i += 1
    }
    val n = math.max(1, samples.length).toDouble
    Array(sampleRate, samples.length.toFloat, math.sqrt(s2 / n).toFloat,
      peak.toFloat, (zc / n).toFloat, (sa / n).toFloat,
      (clip / n).toFloat, (sum / n).toFloat)
  }

  // ------------------------------------------------------------------
  // Video: MJPEG — per-frame JPEG either inside a RIFF/AVI container
  // (`movi` list, `##dc`/`##db` chunks) or as a bare concatenated-JPEG
  // stream. Intra-frame only, so every frame decodes independently via
  // [[decodeImage]] — no codec state, perfectly parallel.

  private def fourcc(b: Array[Byte], p: Int): String =
    if (p + 4 <= b.length) new String(b, p, 4, "US-ASCII") else ""

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | (b(p + 1) & 0xffL) << 8 |
      (b(p + 2) & 0xffL) << 16 | (b(p + 3) & 0xffL) << 24

  /** Extract the raw JPEG bytes of every frame. AVI: walk RIFF chunks,
    * recurse into LISTs, collect video-stream data chunks (fourcc
    * `##dc`/`##db`, word-aligned). Bare stream: split on SOI..EOI
    * marker pairs. Malformed tails stop the walk instead of throwing —
    * a truncated shard yields its decodable prefix. */
  def extractMjpegFrames(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue): Vector[Array[Byte]] =
    if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
        fourcc(bytes, 8) == "AVI ")
      walkChunks(bytes, 12, math.min(bytes.length.toLong, 8 + u32(bytes, 4)),
        maxFrames)
    else splitJpegStream(bytes, maxFrames)

  private def walkChunks(b: Array[Byte], start: Int, end: Long,
      maxFrames: Int): Vector[Array[Byte]] = {
    var out = Vector.empty[Array[Byte]]
    var p = start
    while (p + 8 <= end && out.length < maxFrames) {
      val id = fourcc(b, p)
      val size = u32(b, p + 4)
      if (p + 8 + size > end) return out // truncated chunk
      if (id == "LIST") {
        val listType = fourcc(b, p + 8)
        if (listType == "movi" || listType == "rec ")
          out ++= walkChunks(b, p + 12, p + 8 + size, maxFrames - out.length)
      } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) &&
          id.take(2).forall(_.isDigit)) {
        out :+= java.util.Arrays.copyOfRange(b, p + 8, p + 8 + size.toInt)
      }
      p += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    out
  }

  private def splitJpegStream(b: Array[Byte],
      maxFrames: Int = Int.MaxValue): Vector[Array[Byte]] = {
    var out = Vector.empty[Array[Byte]]
    var i = 0
    while (i + 1 < b.length && out.length < maxFrames) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xd8) { // SOI
        val endAt = jpegEnd(b, i)
        if (endAt < 0) return out // truncated frame
        out :+= java.util.Arrays.copyOfRange(b, i, endAt)
        i = endAt
      } else i += 1
    }
    out
  }

  /** End offset (exclusive) of the JPEG starting at `soi`, or -1 when
    * truncated. SEGMENT-aware: length-bearing segments (APPn/COM/DQT/
    * SOF/...) are SKIPPED by their declared size — an EXIF thumbnail
    * is a complete embedded JPEG with its own EOI inside APP1, so a
    * flat scan for FF D9 truncates real camera frames. After SOS the
    * entropy stream is scanned: encoders byte-stuff FF as FF 00, so
    * the first FF D9 there genuinely ends the image. */
  private def jpegEnd(b: Array[Byte], soi: Int): Int = {
    var i = soi + 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return -1 // marker expected: corrupt
      val m = b(i + 1) & 0xff
      if (m == 0xd9) return i + 2 // EOI (legal: zero-scan JPEG)
      else if (m == 0xda) { // SOS: entropy data until a true EOI
        var j = i + 2
        while (j + 1 < b.length) {
          if ((b(j) & 0xff) == 0xff && (b(j + 1) & 0xff) == 0xd9) return j + 2
          j += 1
        }
        return -1
      } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // bare markers
      else if (i + 3 < b.length) {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        i += 2 + len
      } else return -1
    }
    -1
  }

  /** Decode frame `idx` of an MJPEG video to pixels. */
  def decodeVideoFrame(bytes: Array[Byte], idx: Int): Option[BufferedImage] = {
    if (idx < 0) return None
    // stop the container walk at idx+1 frames: decoding frame 0 of a
    // long video must not copy every frame's bytes first
    val frames = extractMjpegFrames(bytes, idx + 1)
    if (idx >= frames.length) None else decodeImage(frames(idx))
  }

  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics(); try g.drawImage(img, 0, 0, null) finally g.dispose()
        c
      }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(rgb, "jpg", bos)
    bos.toByteArray
  }

  /** Mux JPEG frames into a minimal MJPEG AVI: RIFF(AVI ) with an
    * `hdrl` list (avih + one `vids`/`MJPG` stream header + its
    * BITMAPINFOHEADER) and a `movi` list of `00dc` chunks. No idx1
    * index — players and [[extractMjpegFrames]] stream sequentially. */
  def muxAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(fps > 0, s"fps must be positive: $fps")
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(body.length.toLong) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(4L + body.length) ++ cc(listType) ++ body

    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = le32(1000000L / fps) ++ le32(maxFrame.toLong * fps) ++ le32(0) ++
      le32(0) /* flags: no idx1 index present */ ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(maxFrame.toLong) ++
      le32(width.toLong) ++ le32(height.toLong) ++ Array.fill(16)(0.toByte)
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps.toLong) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(maxFrame.toLong) ++ le32(0xffffffffL) ++
      le32(0) ++ le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le16(1) ++ le16(24) ++ cc("MJPG") ++
      le32(width.toLong * height * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }
}
