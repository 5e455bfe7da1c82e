package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** REAL media codecs built entirely on JDK-standard APIs — no external
  * libraries: `javax.imageio` decodes/encodes PNG/BMP/GIF/JPEG and
  * `javax.sound.sampled` decodes WAV/PCM. These replace the round-1
  * stubs for the image and audio paths (video stays stubbed behind
  * [[MultimodalOps.StubCodecs]] — there is no JDK video codec; at
  * scale that call is an executor-local ffmpeg/native invocation with
  * the same bytes-in/frames-out shape).
  *
  * Everything here is executor-local per-row compute: no shuffle, no
  * driver involvement, arbitrary horizontal scale.
  */
object JdkCodecs {

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
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0; var se = 0.0
    var prevLuma = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
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
}
