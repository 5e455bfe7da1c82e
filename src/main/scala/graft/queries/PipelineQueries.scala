package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation shapes (round 4) that the dedup/similarity
  * packs don't already cover: quantile binning for length-balanced
  * mixtures, PII-style masking audits, and canonical-form (normalized)
  * deduplication. All are narrow per-row transforms + one keyed
  * aggregation — the 100 TB story is a single map stage feeding a
  * small-keyspace shuffle.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // --------------------------------------------------------------------
  // q86 — document-length quantile binning: fixed-width buckets over
  // n_chars (the deterministic analog of the approx_percentile-driven
  // binning a mixture builder runs; fixed edges keep both engines
  // hash-identical). Per-bucket doc count, char mass, and distinct
  // sources — the stats that drive a length-balanced sampling plan.
  private val q86 = QueryDef(
    "q86_length_binning",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("bucket", width_bucket(col("n_chars"), lit(0), lit(400), lit(8)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("bucket")),
    Some("""SELECT CASE WHEN n_chars < 0 THEN 0 WHEN n_chars >= 400 THEN 9
        ELSE n_chars // 50 + 1 END AS bucket,
      count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      count(DISTINCT source) AS n_sources
      FROM documents GROUP BY 1 ORDER BY bucket"""))

  // --------------------------------------------------------------------
  // q87 — PII-style masking audit over customer identifiers: mask every
  // digit except the last 4, count digits redacted, verify masked-form
  // collision count per market segment. The masking expression is a
  // single regexp_replace — pure map work; the audit aggregation is
  // keyed by the (tiny) segment space.
  private val q87 = QueryDef(
    "q87_pii_masking",
    (s, dir) =>
      t(s, dir, "customer")
        .withColumn("prefix",
          substring(col("c_name"), lit(1), length(col("c_name")) - 4))
        .withColumn("masked",
          concat(regexp_replace(col("prefix"), "[0-9]", "*"),
            substring(col("c_name"), -4, 4)))
        .withColumn("n_redacted",
          length(col("prefix"))
            - length(regexp_replace(col("prefix"), "[0-9]", "")))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("n_redacted")).as("digits_redacted"),
          countDistinct(col("masked")).as("n_distinct_masked"))
        .orderBy(col("c_mktsegment")),
    Some("""WITH m AS (
        SELECT c_mktsegment,
          regexp_replace(substr(c_name, 1, length(c_name) - 4),
            '[0-9]', '*', 'g') || substr(c_name, -4, 4) AS masked,
          (length(c_name) - 4) - length(regexp_replace(
            substr(c_name, 1, length(c_name) - 4), '[0-9]', '', 'g'))
            AS n_redacted
        FROM customer)
      SELECT c_mktsegment, count(*) AS n_customers,
        CAST(sum(n_redacted) AS BIGINT) AS digits_redacted,
        count(DISTINCT masked) AS n_distinct_masked
      FROM m GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // --------------------------------------------------------------------
  // q88 — canonical-form dedup: normalize (lowercase, strip
  // non-alphanumerics, collapse whitespace) AND canonicalize word order
  // (sorted token list) before hashing — the cheap pre-pass a dedup
  // pipeline runs before MinHash, catching formatting-only and
  // reordered duplicates exact hashing misses. Shuffles a 128-bit hash
  // of the canonical form, never the text; output is the per-source
  // collapse report (raw docs vs distinct canonical forms).
  private val q88 = QueryDef(
    "q88_normalized_dedup",
    (s, dir) => {
      val cleaned = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
      val canon = concat_ws(" ", sort_array(split(cleaned, " ")))
      t(s, dir, "documents")
        .select(col("source"), md5(canon.cast("binary")).as("canon_hash"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("canon_hash")).as("n_canonical"),
          (count(lit(1)) - countDistinct(col("canon_hash"))).as("n_collapsed"))
        .orderBy(col("source"))
    },
    Some("""WITH c AS (
        SELECT source, md5(list_aggregate(list_sort(string_split(
          trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')),
          'string_agg', ' ')) AS canon_hash
        FROM documents)
      SELECT source, count(*) AS n_docs,
        count(DISTINCT canon_hash) AS n_canonical,
        count(*) - count(DISTINCT canon_hash) AS n_collapsed
      FROM c GROUP BY source ORDER BY source"""))

  // --------------------------------------------------------------------
  // q119 — the multimodal decode pipeline under the hash gate (r16
  // verdict #3, q68's planted-fixture pattern): REAL media bytes —
  // PNG, 16-bit PCM WAV, MJPEG-AVI — are synthesized EXECUTOR-side
  // from doc_id by a deterministic planting formula, then decoded
  // distributively by the production operators
  // ([[graft.multimodal.MultimodalOps]] / [[graft.multimodal.JdkCodecs]]:
  // feature extraction, frame sampling, resize + PNG re-encode), and
  // the integer features — width, height, frame count, PCM sample sum
  // — compare against the oracle's restatement of the planting
  // formula. PNG is lossless and 16-bit PCM round-trips planted
  // k/32768 samples bit-exactly, so the gate is exact. Every stage is
  // a narrow per-row map (synthesis and decode never shuffle); the
  // final assembly joins tiny per-kind frames on doc_id.
  private val q119 = QueryDef(
    "q119_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MultimodalOps
      val ids = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
      val media = ids.map(Q119.plant _).persist()
      // dims from the ALL-kinds feature extractor: images and video
      // first frames carry [width, height, ...]; audio rows don't
      val dims = MultimodalOps.extractFeatures(media).toDF()
        .select(col("media_id").as("doc_id"), col("kind"),
          when(col("kind") =!= "audio",
            col("features")(0).cast("long")).as("w"),
          when(col("kind") =!= "audio",
            col("features")(1).cast("long")).as("h"))
      // frame count via frame sampling at stride 1 (every JPEG frame
      // of each MJPEG video decodes independently)
      val nf = MultimodalOps.sampleFrames(media, 1).toDF()
        .groupBy(col("media_id").as("doc_id"))
        .agg(count(lit(1)).as("nf"))
      // exact PCM sum: decode WAV, recover the planted 16-bit values
      val pcm = media.filter(_.kind == "audio").mapPartitions(_.map { m =>
        val samples = graft.multimodal.JdkCodecs.decodeWav(m.bytes)
          .getOrElse(throw new IllegalStateException(
            s"q119: planted WAV ${m.media_id} failed to decode"))._2
        var acc = 0L
        var i = 0
        while (i < samples.length) {
          acc += Math.round(samples(i) * 32768f).toLong
          i += 1
        }
        (m.media_id, acc)
      }).toDF("doc_id", "pcm")
      // resize drives decode → bilinear scale → PNG re-encode → decode
      val rsz = MultimodalOps.extractImageFeatures(
          MultimodalOps.resizeImages(media, 16, 12)).toDF()
        .select(col("media_id").as("doc_id"),
          col("features")(0).cast("long").as("rw"),
          col("features")(1).cast("long").as("rh"))
      // materialize the (small) gate frame, then release the cached
      // media bytes — a leaked persist would hold two full media
      // copies per bench run for the rest of the suite
      val res = dims.join(nf, Seq("doc_id"), "left")
        .join(pcm, Seq("doc_id"), "left")
        .join(rsz, Seq("doc_id"), "left")
        .select(col("doc_id"), col("kind"), col("w"), col("h"),
          col("nf"), col("pcm"), col("rw"), col("rh"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
      media.unpersist()
      res
    },
    Some("""WITH pcmt AS (
        SELECT d.doc_id, SUM((d.doc_id*31 + t.i*7) % 2001 - 1000) AS s
        FROM documents d JOIN generate_series(0, 898) t(i)
          ON t.i < 400 + (d.doc_id % 5) * 100
        WHERE d.doc_id % 3 = 1 GROUP BY d.doc_id)
      SELECT d.doc_id,
        CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          ELSE 'video' END AS kind,
        CAST(CASE WHEN d.doc_id % 3 = 0 THEN 24 + (d.doc_id % 4) * 8
          WHEN d.doc_id % 3 = 2 THEN 16 + (d.doc_id % 5) * 8 END
          AS BIGINT) AS w,
        CAST(CASE WHEN d.doc_id % 3 = 0 THEN 16 + (d.doc_id % 5) * 4
          WHEN d.doc_id % 3 = 2 THEN 24 END AS BIGINT) AS h,
        CAST(CASE WHEN d.doc_id % 3 = 2 THEN 4 + d.doc_id % 4 END
          AS BIGINT) AS nf,
        CAST(p.s AS BIGINT) AS pcm,
        CAST(CASE WHEN d.doc_id % 3 = 0 THEN 16 END AS BIGINT) AS rw,
        CAST(CASE WHEN d.doc_id % 3 = 0 THEN 12 END AS BIGINT) AS rh
      FROM documents d LEFT JOIN pcmt p USING (doc_id)
      ORDER BY d.doc_id"""))

  // --------------------------------------------------------------------
  // q122 — corrupt-media TOLERANCE under the hash gate (r17 verdict
  // #4): at 100 TB the dominant multimodal reality is undecodable
  // bytes, and the skip-and-count path is the production path. Every
  // 7th doc_id's media is deterministically corrupted — truncated PNG
  // (mid-IHDR), truncated WAV (mid-RIFF-header), and a structurally
  // VALID zero-frame AVI — then the SAME production operators as q119
  // run over the mixed corpus. The gate counts per kind: total,
  // decoded (non-null features), skipped (null), plus the exact width
  // sum and frame-count sum over the rows that MUST still decode —
  // so a decoder that dies on corrupt bytes, silently "decodes" them,
  // or drops a clean neighbor all flip the hash. Some planted inputs
  // MUST fail: n_skipped is part of the oracle.
  private val q122 = QueryDef(
    "q122_corrupt_media",
    (s, dir) => {
      import s.implicits._
      import graft.multimodal.MultimodalOps
      val ids = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
      val media = ids.map(Q122.plant _).persist()
      val feats = MultimodalOps.extractFeatures(media).toDF()
        .select(col("media_id").as("doc_id"), col("kind"),
          col("features").isNotNull.as("dec"),
          when(col("kind") =!= "audio" && col("features").isNotNull,
            col("features")(0).cast("long")).as("w"))
      // frame sampling over the mixed corpus: the zero-frame AVI and
      // the truncated media yield NO frames (skip, not crash)
      val nf = MultimodalOps.sampleFrames(media, 1).toDF()
        .groupBy(col("media_id").as("doc_id"))
        .agg(count(lit(1)).as("nfr"))
      val res = feats.join(nf, Seq("doc_id"), "left")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          count(when(col("dec"), 1)).as("n_decoded"),
          count(when(!col("dec"), 1)).as("n_skipped"),
          sum(col("w")).cast("long").as("wsum"),
          sum(col("nfr")).cast("long").as("nfsum"))
        .orderBy(col("kind"))
        .localCheckpoint(true)
      media.unpersist()
      res
    },
    Some("""WITH m AS (
        SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
          (doc_id % 7 = 0) AS corrupt,
          CASE WHEN doc_id % 3 = 0 THEN 24 + (doc_id % 4) * 8
               WHEN doc_id % 3 = 2 THEN 16 + (doc_id % 5) * 8 END AS w,
          CASE WHEN doc_id % 3 = 2 THEN 4 + doc_id % 4 END AS nf
        FROM documents)
      SELECT kind, count(*) AS n,
        count(CASE WHEN NOT corrupt THEN 1 END) AS n_decoded,
        count(CASE WHEN corrupt THEN 1 END) AS n_skipped,
        CAST(sum(CASE WHEN NOT corrupt THEN w END) AS BIGINT) AS wsum,
        CAST(sum(CASE WHEN NOT corrupt AND kind = 'video' THEN nf END)
          AS BIGINT) AS nfsum
      FROM m GROUP BY kind ORDER BY kind"""))

  val defs: Seq[QueryDef] = Seq(q86, q87, q88, q119, q122)
}

/** q122's planting: [[Q119.plant]]'s clean media, with every 7th
  * doc_id deterministically CORRUPTED — the three failure classes a
  * 100 TB crawl actually serves (truncated image, torn audio header,
  * a container whose index is valid but empty). */
private object Q122 extends Serializable {
  import graft.multimodal.JdkCodecs
  import graft.multimodal.MultimodalOps.MediaRow

  def plant(id: Long): MediaRow = {
    val m = Q119.plant(id)
    if (id % 7 != 0) m
    else m.kind match {
      case "video" =>
        // structurally valid AVI, zero frames: parses, yields nothing
        m.copy(bytes = JdkCodecs.muxAvi(Seq.empty, 8, 8))
      case _ =>
        // truncation mid-header: PNG dies inside IHDR, WAV inside RIFF
        m.copy(bytes = java.util.Arrays.copyOf(m.bytes,
          math.min(24, m.bytes.length)))
    }
  }
}

/** q119's deterministic media planting (serializable — ships to
  * executors; the driver never touches a media byte). The formulas
  * here are the single source the oracle SQL restates. */
private object Q119 extends Serializable {
  import graft.multimodal.JdkCodecs
  import graft.multimodal.MultimodalOps.{MediaMeta, MediaRow}

  private def img(seed: Long, w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // same pixel formula, one bulk setRGB instead of w*h calls
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = (((seed + x * 31 + y * 7) % 255).toInt << 16) | 0x8040
        x += 1
      }
      y += 1
    }
    im.setRGB(0, 0, w, h, px, 0, w)
    im
  }

  def plant(id: Long): MediaRow = (id % 3) match {
    case 0 =>
      val w = 24 + (id % 4).toInt * 8
      val h = 16 + (id % 5).toInt * 4
      MediaRow(id, "image", JdkCodecs.encodePng(img(id, w, h)),
        MediaMeta(w, h, 0, 1, "png"))
    case 1 =>
      // 16-bit PCM: k/32768 with |k| <= 1000 survives the encode's
      // round(v*32767) and the decode's short/32768 bit-exactly
      val n = 400 + (id % 5).toInt * 100
      val samples = Array.tabulate(n)(i =>
        ((id * 31 + i * 7) % 2001 - 1000).toFloat / 32768f)
      MediaRow(id, "audio", JdkCodecs.encodeWav(8000f, samples),
        MediaMeta(0, 0, 8000, 0, "wav"))
    case _ =>
      val nf = 4 + (id % 4).toInt
      val w = 16 + (id % 5).toInt * 8
      val h = 24
      val frames = (0 until nf).map(f =>
        JdkCodecs.encodeJpeg(img(id * 131 + f, w, h)))
      MediaRow(id, "video", JdkCodecs.muxAvi(frames, w, h),
        MediaMeta(w, h, 0, nf, "avi"))
  }
}
