package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for the training-data pipeline: media
  * (image/audio/video) as opaque `binary` columns with typed metadata,
  * processed by per-partition batch operators.
  *
  * The Spark-side plumbing — schema, partitioning, operator signatures,
  * batch shape (one iterator per partition, the Scala analog of
  * `mapInPandas` batches) — is real and tested. The IMAGE and AUDIO
  * codecs are real too ([[JdkCodecs]]: javax.imageio for PNG/BMP/GIF/
  * JPEG, javax.sound for WAV — JDK built-ins, no external libraries).
  * Only the VIDEO codec is a deterministic STUB (`StubCodecs`): no JDK
  * video decoder exists; at 100 TB that call is an executor-local
  * ffmpeg/native invocation with exactly this shape — bytes in,
  * fixed-size features/frames out, no shuffle, no driver involvement.
  */
object MultimodalOps {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int,
      nFrames: Int, format: String)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB CODECS — deterministic fakes standing in for libjpeg/ffmpeg
    * etc. Real deployments swap these for native decoders; everything
    * around them (schema, batching, partitioning) is unchanged. */
  object StubCodecs {
    /** ??? real impl: decode compressed image bytes → pixel buffer. */
    def decodeImage(bytes: Array[Byte]): Array[Byte] = {
      // deterministic fake: xor-rolled bytes, fixed 64-byte "pixels"
      val out = new Array[Byte](64)
      var acc = 17
      var i = 0
      while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) & 0x7fffffff; i += 1 }
      i = 0
      while (i < out.length) { acc = (acc * 1103515245 + 12345) & 0x7fffffff; out(i) = (acc & 0xff).toByte; i += 1 }
      out
    }

    /** ??? real impl: resample pixels to (w, h). */
    def resize(pixels: Array[Byte], w: Int, h: Int): Array[Byte] =
      pixels.take(math.max(1, math.min(pixels.length, w * h / 64)))

    /** ??? real impl: decode frame `idx` of a video stream. */
    def decodeFrame(bytes: Array[Byte], idx: Int): Array[Byte] =
      decodeImage(bytes :+ idx.toByte)

    /** ??? real impl: embed pixels via a vision model. 8-d fake. */
    def embed(pixels: Array[Byte]): Array[Float] = {
      val f = new Array[Float](8)
      var i = 0
      while (i < pixels.length) { f(i % 8) += (pixels(i) & 0xff) / 255.0f; i += 1 }
      f
    }
  }

  /** Deterministic synthetic media corpus (seeded by id). */
  def synthesize(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 32 + (id % 96).toInt
      val bytes = Array.tabulate(len)(i => ((id * 131 + i * 31 + 7) % 251).toByte)
      val meta = kind match {
        case "image" => MediaMeta(64 + (id % 8).toInt * 16, 64, 0, 1, "png")
        case "audio" => MediaMeta(0, 0, 16000, 0, "wav")
        case _ => MediaMeta(128, 72, 0, 8 + (id % 8).toInt, "mp4")
      }
      MediaRow(id, kind, bytes, meta)
    }
  }

  /** Feature extraction: decode + embed per partition (batch shape —
    * the iterator is the batch; no per-row task overhead, executors
    * stream partitions independently). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val pixels = StubCodecs.decodeImage(m.bytes)
        MediaFeatures(m.media_id, m.kind, StubCodecs.embed(pixels))
      }
    }
  }

  /** Image resize as a columnar transform (meta updated in lock-step). */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else m.copy(
        bytes = StubCodecs.resize(StubCodecs.decodeImage(m.bytes), w, h),
        meta = m.meta.copy(width = w, height = h))
    })
  }

  // ------------------------------------------------------------------
  // REAL image/audio paths (JDK codecs — see [[JdkCodecs]]); same batch
  // shapes as the stub pipeline, so swapping codecs changes no plumbing.

  /** Real image feature extraction over PNG/BMP/GIF/JPEG bytes.
    * Undecodable rows surface null features (curation pipelines filter
    * them, they must not kill the job). */
  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val feats = JdkCodecs.decodeImage(m.bytes)
        .map(JdkCodecs.imageFeatures).orNull
      MediaFeatures(m.media_id, m.kind, feats)
    })
  }

  /** Real image resize: decode → bilinear scale → PNG re-encode, meta
    * updated in lock-step. Undecodable rows pass through unchanged. */
  def resizeImagesReal(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
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

  /** Real audio feature extraction over WAV bytes (silence/clipping/
    * quality gates). Undecodable rows surface null features. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.map { m =>
      val feats = JdkCodecs.decodeWav(m.bytes)
        .map { case (sr, samples) => JdkCodecs.audioFeatures(sr, samples) }
        .orNull
      MediaFeatures(m.media_id, m.kind, feats)
    })
  }

  /** Frame sampling: every `stride`-th frame of each video, exploded to
    * one row per frame — the flatMap shape that parallelizes per video
    * then per frame downstream. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0 until m.meta.nFrames by stride).map { idx =>
        Frame(m.media_id, idx, StubCodecs.decodeFrame(m.bytes, idx))
      }
    }
  }
}
