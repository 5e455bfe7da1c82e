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

  val defs: Seq[QueryDef] = Seq(q86, q87, q88)
}
