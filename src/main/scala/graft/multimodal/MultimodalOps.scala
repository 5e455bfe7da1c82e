package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing for the training-data pipeline: media
  * (image/audio/video) as opaque `binary` columns with typed metadata,
  * processed by per-partition batch operators.
  *
  * All three codec paths are REAL, JDK-only ([[JdkCodecs]]):
  * javax.imageio for PNG/BMP/GIF/JPEG, javax.sound for WAV, and MJPEG
  * (AVI container or bare concatenated JPEG) for video — every frame is
  * an independent JPEG, so frame extraction needs no codec state.
  * Inter-frame codecs (H.264 …) would be an executor-local native
  * invocation with exactly the same shape — bytes in, fixed-size
  * features/frames out, no shuffle, no driver involvement.
  *
  * The batch shape is `mapPartitions` (one iterator per partition, the
  * Scala analog of `mapInPandas` batches): no per-row task overhead,
  * executors stream partitions independently, corrupt media surfaces
  * null features instead of killing the task.
  */
object MultimodalOps {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int,
      nFrames: Int, format: String)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media corpus (seeded by id) of REAL
    * decodable media: PNG images, 16-bit PCM WAV clips, and MJPEG-AVI
    * videos — produced with the same codecs a real pipeline would
    * ingest. */
  def synthesize(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      (id % 3) match {
        case 0 =>
          val w = 24 + (id % 4).toInt * 8
          val h = 16
          val img = syntheticImage(id, w, h)
          MediaRow(id, "image", JdkCodecs.encodePng(img),
            MediaMeta(w, h, 0, 1, "png"))
        case 1 =>
          val sr = 8000f
          val nSamples = 400 + (id % 5).toInt * 100
          val freq = 100.0 + (id % 7).toDouble * 50.0
          val samples = Array.tabulate(nSamples)(i =>
            (0.6 * math.sin(2 * math.Pi * freq * i / sr)).toFloat)
          MediaRow(id, "audio", JdkCodecs.encodeWav(sr, samples),
            MediaMeta(0, 0, sr.toInt, 0, "wav"))
        case _ =>
          val nFrames = 4 + (id % 4).toInt
          val w = 32; val h = 24
          val frames = (0 until nFrames).map(f =>
            JdkCodecs.encodeJpeg(syntheticImage(id * 131 + f, w, h)))
          MediaRow(id, "video", JdkCodecs.muxAvi(frames, w, h),
            MediaMeta(w, h, 0, nFrames, "avi"))
      }
    }
  }

  private def syntheticImage(seed: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // same pixel formula, one bulk setRGB instead of w*h calls
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (seed * 1103515245L + x * 31L + y * 131L) & 0x7fffffffL
        px(y * w + x) = ((v % 251).toInt << 16) |
          (((v >> 8) % 251).toInt << 8) | ((v >> 16) % 251).toInt
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  /** Feature extraction for ALL media kinds: images and video first
    * frames yield the 8-dim image statistics vector, audio the 8-dim
    * signal statistics vector. Undecodable rows surface null features
    * (curation pipelines filter them, they must not kill the job). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val feats = m.kind match {
        case "image" =>
          JdkCodecs.decodeImage(m.bytes).map(JdkCodecs.imageFeatures).orNull
        case "audio" =>
          JdkCodecs.decodeWav(m.bytes)
            .map { case (sr, s) => JdkCodecs.audioFeatures(sr, s) }.orNull
        case _ =>
          JdkCodecs.decodeVideoFrame(m.bytes, 0)
            .map(JdkCodecs.imageFeatures).orNull
      }
      MediaFeatures(m.media_id, m.kind, feats)
    })
  }

  /** Image feature extraction only (images filtered source-side). */
  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val feats = JdkCodecs.decodeImage(m.bytes)
        .map(JdkCodecs.imageFeatures).orNull
      MediaFeatures(m.media_id, m.kind, feats)
    })
  }

  /** Image resize: decode → bilinear scale → PNG re-encode, meta
    * updated in lock-step. Non-images and undecodable rows pass
    * through unchanged. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else JdkCodecs.decodeImage(m.bytes) match {
        case Some(img) => m.copy(
          bytes = JdkCodecs.encodePng(JdkCodecs.resize(img, w, h)),
          meta = m.meta.copy(width = w, height = h, format = "png"))
        case None => m
      }
    })
  }

  /** Audio feature extraction over WAV bytes (silence/clipping/quality
    * gates). Undecodable rows surface null features. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.map { m =>
      val feats = JdkCodecs.decodeWav(m.bytes)
        .map { case (sr, samples) => JdkCodecs.audioFeatures(sr, samples) }
        .orNull
      MediaFeatures(m.media_id, m.kind, feats)
    })
  }

  /** Frame sampling: every `stride`-th JPEG frame of each MJPEG video,
    * exploded to one row per frame — the flatMap shape that
    * parallelizes per video then per frame downstream. Frame bytes are
    * the raw per-frame JPEG (decodable by [[JdkCodecs.decodeImage]]). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    require(stride > 0, s"frame stride must be positive: $stride")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = JdkCodecs.extractMjpegFrames(m.bytes)
      (0 until frames.length by stride).map(idx =>
        Frame(m.media_id, idx, frames(idx)))
    }
  }
}
