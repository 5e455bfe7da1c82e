package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import graft.SparkSpec
import graft.multimodal.MultimodalOps._

/** End-to-end multimodal pipeline over REAL media: PNGs and WAVs are
  * synthesized with the same JDK APIs a producer would use, run through
  * the distributed decode/resize/feature operators, and the features
  * are checked against the constructed ground truth. */
class JdkCodecsSpec extends SparkSpec {
  import spark.implicits._

  /** Solid-color PNG (deterministic per id). */
  private def makePng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    JdkCodecs.encodePng(img)
  }

  /** 16-bit mono PCM WAV of a square wave with amplitude `amp`. */
  private def makeWav(sr: Int, n: Int, period: Int, amp: Double): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (if ((i / period) % 2 == 0) amp else -amp) * 32767.0
      val s = v.toInt.toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real PNG decode → features recover constructed color and dims") {
    val rows = (0 until 12).map { i =>
      val rgb = (20 * i << 16) | (10 * i << 8) | (5 * i)
      MediaRow(i.toLong, "image", makePng(32 + i, 16, rgb),
        MediaMeta(32 + i, 16, 0, 1, "png"))
    }
    val feats = extractImageFeatures(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    assert(feats.length === 12)
    feats.zipWithIndex.foreach { case (f, i) =>
      assert(f.features.length === 8)
      assert(f.features(0) === (32 + i).toFloat && f.features(1) === 16f)
      // solid color: channel means exact, luma variance and edges zero
      assert(math.abs(f.features(2) - 20 * i) < 0.5)
      assert(math.abs(f.features(3) - 10 * i) < 0.5)
      assert(math.abs(f.features(4) - 5 * i) < 0.5)
      assert(f.features(6) < 1e-3 && f.features(7) < 1e-3)
    }
  }

  test("real image resize re-encodes to requested dimensions") {
    val rows = Seq(MediaRow(1L, "image", makePng(64, 48, 0x336699),
      MediaMeta(64, 48, 0, 1, "png")),
      MediaRow(2L, "audio", Array[Byte](1, 2, 3), MediaMeta(0, 0, 16000, 0, "wav")))
    val out = resizeImages(spark.createDataset(rows), 16, 12)
      .collect().sortBy(_.media_id)
    val img = JdkCodecs.decodeImage(out(0).bytes).get
    assert(img.getWidth === 16 && img.getHeight === 12)
    assert(out(0).meta.width === 16 && out(0).meta.height === 12)
    // solid color survives bilinear resize
    assert((img.getRGB(8, 6) & 0xffffff) === 0x336699)
    // non-image rows pass through untouched
    assert(out(1).bytes.toSeq === Seq[Byte](1, 2, 3))
  }

  test("real WAV decode → RMS/peak/zero-crossing match the square wave") {
    val sr = 16000; val n = 8000; val period = 40; val amp = 0.5
    val rows = Seq(MediaRow(7L, "audio", makeWav(sr, n, period, amp),
      MediaMeta(0, 0, sr, 0, "wav")))
    val f = extractAudioFeatures(spark.createDataset(rows)).collect().head.features
    assert(f(0) === sr.toFloat && f(1) === n.toFloat)
    assert(math.abs(f(2) - amp) < 0.01)         // RMS of a square wave = amp
    assert(math.abs(f(3) - amp) < 0.01)         // peak = amp
    assert(math.abs(f(4) - 1.0 / period) < 0.01) // one crossing per half period
    assert(f(6) === 0.0f)                        // no clipping at 0.5
  }

  test("undecodable media yields null features, not task failure") {
    val junk = Seq(
      MediaRow(1L, "image", Array.tabulate(40)(_.toByte), MediaMeta(0, 0, 0, 1, "png")),
      MediaRow(2L, "audio", Array.tabulate(40)(_.toByte), MediaMeta(0, 0, 0, 0, "wav")))
    val imgs = extractImageFeatures(spark.createDataset(junk)).collect()
    val auds = extractAudioFeatures(spark.createDataset(junk)).collect()
    assert(imgs.length === 1 && imgs.head.features == null)
    assert(auds.length === 1 && auds.head.features == null)
  }

  test("MJPEG-AVI mux → demux returns every frame byte-for-byte (golden)") {
    val jpegs = (0 until 5).map { i =>
      val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 24) { var x = 0; while (x < 32) {
        img.setRGB(x, y, ((x * 8 + i * 40) << 16) | (y * 10 << 8) | i * 50); x += 1 }; y += 1 }
      JdkCodecs.encodeJpeg(img)
    }
    val avi = JdkCodecs.muxAvi(jpegs, 32, 24)
    // container golden checks: RIFF/AVI magic, hdrl + movi lists present
    assert(new String(avi.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    val frames = JdkCodecs.extractMjpegFrames(avi)
    assert(frames.length === 5)
    frames.zip(jpegs).foreach { case (got, want) =>
      assert(got.toSeq === want.toSeq) // exact bytes through the container
    }
    // every extracted frame is independently decodable with right dims
    frames.foreach { f =>
      val img = JdkCodecs.decodeImage(f).get
      assert(img.getWidth === 32 && img.getHeight === 24)
    }
    // odd-sized chunks exercise the RIFF word-alignment padding
    val oddBlobs = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    val avi2 = JdkCodecs.muxAvi(oddBlobs, 4, 4)
    assert(JdkCodecs.extractMjpegFrames(avi2).map(_.toSeq)
      === oddBlobs.map(_.toSeq).toVector)
  }

  test("bare concatenated-JPEG stream splits on SOI/EOI pairs") {
    val jpegs = (0 until 3).map { i =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      img.setRGB(i, i, 0xffffff)
      JdkCodecs.encodeJpeg(img)
    }
    val stream = jpegs.flatten.toArray
    val frames = JdkCodecs.extractMjpegFrames(stream)
    assert(frames.length === 3)
    frames.zip(jpegs).foreach { case (got, want) => assert(got.toSeq === want.toSeq) }
    // truncated tail: decodable prefix survives
    val truncated = stream.dropRight(4)
    assert(JdkCodecs.extractMjpegFrames(truncated).length === 2)
  }

  test("video frame decode + synthesized corpus features are real end-to-end") {
    val media = synthesize(spark, 30).repartition(4)
    val feats = extractFeatures(media).collect()
    // EVERY synthesized row (image, audio, AND video) decodes for real
    assert(feats.length === 30)
    assert(feats.forall(_.features != null))
    assert(feats.forall(_.features.length === 8))
    // video frames decode individually at the declared dimensions
    val videos = media.filter(_.kind == "video").collect()
    videos.foreach { v =>
      val img = JdkCodecs.decodeVideoFrame(v.bytes, v.meta.nFrames - 1).get
      assert(img.getWidth === v.meta.width && img.getHeight === v.meta.height)
      assert(JdkCodecs.decodeVideoFrame(v.bytes, v.meta.nFrames).isEmpty)
    }
  }

  test("JPEG frames with EXIF-style embedded thumbnails split correctly") {
    // an APP1 segment whose payload is a COMPLETE embedded JPEG (its
    // own SOI..EOI, as EXIF thumbnails are): a flat FF D9 scan would
    // truncate the outer frame at the thumbnail's EOI
    def withExifThumb(outer: Array[Byte], thumb: Array[Byte]): Array[Byte] = {
      val segLen = 2 + thumb.length
      val app1 = Array(0xff.toByte, 0xe1.toByte,
        ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++ thumb
      // splice APP1 right after SOI
      outer.take(2) ++ app1 ++ outer.drop(2)
    }
    val mk = { (shade: Int) =>
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      img.setRGB(1, 1, shade)
      JdkCodecs.encodeJpeg(img)
    }
    val thumb = mk(0x808080)
    val f1 = withExifThumb(mk(0xffffff), thumb)
    val f2 = mk(0x123456)
    val frames = JdkCodecs.extractMjpegFrames(f1 ++ f2)
    assert(frames.length === 2)
    assert(frames(0).toSeq === f1.toSeq) // not cut at the thumbnail EOI
    assert(frames(1).toSeq === f2.toSeq)
    assert(JdkCodecs.decodeImage(frames(0)).isDefined)
  }

  test("decodeWav refuses non-16/8-bit-PCM layouts instead of garbling") {
    // 32-bit float WAV: parses in AudioSystem but the sample loop
    // cannot decode it — must be None, not garbage rms stats
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT, 8000f, 32, 1, 4, 8000f, false)
    val n = 64
    val raw = new Array[Byte](n * 4)
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putFloat(if (i % 2 == 0) 1.0f else -1.0f))
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(JdkCodecs.decodeWav(out.toByteArray).isEmpty)
  }
}
