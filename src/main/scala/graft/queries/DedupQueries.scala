package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import HashFrags.{A, B, P, wordCodeSpark, wordCodeDuck}

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard, MinHash signatures + banded LSH
  * candidate pairs, and SimHash — all over the `documents` table.
  *
  * Scale design notes (what survives 100 TB):
  * - exact dedup: single shuffle on a 128-bit content hash, never on
  *   the full text.
  * - Jaccard pairs: shingle-inverted-index join (explode → join on
  *   shingle), NOT an n² cross join; hot shingles are the skew risk at
  *   scale and would be handled by dropping ultra-frequent shingles
  *   (stop-shingle cutoff) — the LSH variant below is the real scale
  *   path.
  * - MinHash/LSH: O(n) signature computation + join on (band, value) —
  *   the standard sub-quadratic near-dup pipeline.
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // --------------------------------------------------------------------
  // q60 — exact dedup on content hash: keep lowest doc_id per distinct
  // text, count duplicates per group.
  private val q60 = QueryDef(
    "q60_exact_dedup",
    (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("dup_count"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("keep_id")),
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      count(*) AS dup_count, count(DISTINCT source) AS n_sources
      FROM documents GROUP BY md5(text) ORDER BY keep_id"""))

  // --------------------------------------------------------------------
  // q61 — n-gram Jaccard near-dup pairs: word-bigram shingles, inverted
  // index self-join, exact Jaccard ≥ 0.08.
  private val q61 = QueryDef(
    "q61_jaccard_pairs",
    (s, dir) => {
      val sh = t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          explode(expr(
            """array_distinct(transform(sequence(1, size(words) - 1),
               i -> concat(element_at(words, i), ' ', element_at(words, i + 1))))"""))
            .as("shingle"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val pairs = sh.as("a")
        .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.08)
        .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""WITH sh AS (
        SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
          range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))) AS shingle
        FROM documents),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, inter,
        CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
      FROM pairs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
      WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.08
      ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q62 — MinHash signatures: 8 permutations over the unigram word-code
  // set (min is order-free, exact integer arithmetic).
  private def sigSelectSpark: Seq[Column] =
    A.indices.map(i => min(expr(s"(${A(i)} * code + ${B(i)}) % $P")).as(s"mh$i"))
  private def sigSelectDuck: String =
    A.indices.map(i => s"min((${A(i)} * code + ${B(i)}) % $P) AS mh$i").mkString(", ")

  private def wordCodes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct()
      .withColumn("code", expr(wordCodeSpark("word")))

  private val wordCodesDuck: String =
    s"""codes AS (SELECT DISTINCT doc_id, ${wordCodeDuck("word")} AS code
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) w)"""

  private val q62 = QueryDef(
    "q62_minhash_sig",
    (s, dir) =>
      wordCodes(s, dir)
        .groupBy(col("doc_id"))
        .agg(sigSelectSpark.head, sigSelectSpark.tail: _*)
        .orderBy(col("doc_id")),
    Some(s"""WITH $wordCodesDuck
      SELECT doc_id, $sigSelectDuck FROM codes GROUP BY doc_id ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q63 — LSH candidate pairs: 4 bands × 2 rows over the q62 signature;
  // pairs sharing ≥1 band get their exact unigram Jaccard computed and
  // are kept at ≥ 0.5. Sub-quadratic: the only join key is (band, value).
  private val q63 = QueryDef(
    "q63_minhash_lsh_pairs",
    (s, dir) => {
      val sig = wordCodes(s, dir).groupBy(col("doc_id"))
        .agg(sigSelectSpark.head, sigSelectSpark.tail: _*)
      val bands = sig.select(col("doc_id"), explode(expr(
        s"""array(struct(0 AS band, mh0 * $P + mh1 AS v),
                 struct(1 AS band, mh2 * $P + mh3 AS v),
                 struct(2 AS band, mh4 * $P + mh5 AS v),
                 struct(3 AS band, mh6 * $P + mh7 AS v))""")).as("bv"))
        .select(col("doc_id"), col("bv.band").as("band"), col("bv.v").as("v"))
      val cand = bands.as("x")
        .join(bands.as("y"), col("x.band") === col("y.band") &&
          col("x.v") === col("y.v") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .distinct()
      val sizes = words.groupBy(col("doc_id")).agg(count(lit(1)).as("nw"))
      val inter = cand
        .join(words.select(col("doc_id").as("a_id"), col("word")), "a_id")
        .join(words.select(col("doc_id").as("b_id"), col("word").as("w2")), "b_id")
        .filter(col("word") === col("w2"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("a_id"), col("nw").as("na")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("nw").as("nb")), "b_id")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("a_id"), col("b_id"), col("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""WITH $wordCodesDuck,
      sig AS (SELECT doc_id, $sigSelectDuck FROM codes GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band, mh0 * $P + mh1 AS v FROM sig UNION ALL
        SELECT doc_id, 1, mh2 * $P + mh3 FROM sig UNION ALL
        SELECT doc_id, 2, mh4 * $P + mh5 FROM sig UNION ALL
        SELECT doc_id, 3, mh6 * $P + mh7 FROM sig),
      cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x JOIN bands y ON x.band = y.band AND x.v = y.v
          AND x.doc_id < y.doc_id),
      words AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      sizes AS (SELECT doc_id, count(*) AS nw FROM words GROUP BY doc_id),
      inter AS (SELECT a_id, b_id, count(*) AS inter
        FROM cand JOIN words wa ON wa.doc_id = a_id
        JOIN words wb ON wb.doc_id = b_id AND wa.word = wb.word
        GROUP BY a_id, b_id)
      SELECT a_id, b_id,
        CAST(inter AS DOUBLE) / (sa.nw + sb.nw - inter) AS jaccard
      FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
      WHERE CAST(inter AS DOUBLE) / (sa.nw + sb.nw - inter) >= 0.5
      ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q64 — SimHash: 31-bit signature from occurrence-weighted word-code
  // bits (exact integer netsums; bit j set iff netsum_j > 0).
  private val q64 = QueryDef(
    "q64_simhash",
    (s, dir) => {
      val wc = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
        .withColumn("code", expr(wordCodeSpark("word")))
      wc.select(col("doc_id"), col("cnt"), col("code"),
          explode(expr("sequence(0, 30)")).as("bit"))
        .withColumn("contrib",
          col("cnt") * (expr("(code >> bit) & 1") * 2 - 1))
        .groupBy(col("doc_id"), col("bit"))
        .agg(sum(col("contrib")).as("net"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("net") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
          .otherwise(0L)).as("simhash"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH wc AS (
        SELECT doc_id, count(*) AS cnt, ${wordCodeDuck("word")} AS code
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) w
        GROUP BY doc_id, word),
      bits AS (SELECT doc_id, bit,
          sum(cnt * (((code >> CAST(bit AS INT)) & 1) * 2 - 1)) AS net
        FROM wc, (SELECT unnest(range(0, 31)) AS bit) b
        GROUP BY doc_id, bit)
      SELECT doc_id,
        sum(CASE WHEN net > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(q60, q61, q62, q63, q64)
}
