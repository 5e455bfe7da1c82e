package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for the training-data pipeline: token
  * counting, quality scoring, language ID, document fingerprinting —
  * all over the `documents` table.
  *
  * Hashing primitive shared with the dedup pack: a char-level
  * polynomial fold mod 1e9+7 that both Spark (`aggregate` HOF) and the
  * DuckDB oracle (`list_reduce`) evaluate identically in exact BIGINT
  * arithmetic (values stay < 2^35, far from overflow). Engine-native
  * hash functions (xxhash64, md5) are used only where both engines
  * implement the identical public algorithm.
  *
  * Scale: every query here is embarrassingly parallel per-document
  * (narrow transforms, no join), then a bounded aggregation — the shape
  * that scales linearly to 100 TB.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  import HashFrags.{wordCodeSpark, wordCodeDuck}

  // --------------------------------------------------------------------
  // q50 — token counting: whitespace tokens + BPE-ish regex tokens.
  private val q50 = QueryDef(
    "q50_token_stats",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").as("n_re_tokens"),
          length(col("text")).as("text_len"),
          col("n_chars"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
      len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
      length(text) AS text_len, n_chars
      FROM documents ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q51 — quality scoring: token count, mean word length, stopword
  // ratio, and a binary keep/drop flag (all exact-integer derived).
  private val q51 = QueryDef(
    "q51_quality_score",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("words")).as("n_tokens"),
          (expr("CAST(aggregate(transform(words, w -> length(w)), 0, (a, x) -> a + x) AS DOUBLE)") /
            size(col("words"))).as("mean_word_len"),
          (expr("CAST(size(filter(words, w -> w IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)") /
            size(col("words"))).as("stop_ratio"))
        .withColumn("is_quality",
          col("n_tokens").between(20, 1000) && col("stop_ratio") < lit(0.4))
        .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      SELECT doc_id, n_tokens, mean_word_len, stop_ratio,
        (n_tokens BETWEEN 20 AND 1000) AND stop_ratio < 0.4 AS is_quality
      FROM (SELECT doc_id, len(words) AS n_tokens,
        CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE) / len(words) AS mean_word_len,
        CAST(len(list_filter(words, w -> w IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE) / len(words) AS stop_ratio
        FROM w) x ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q52 — language ID: marker-word frequency scoring with a fixed
  // alphabetical-first-wins argmax (the classic n-gram/stopword
  // heuristic; markers chosen from the corpus's per-language top terms).
  private val q52 = QueryDef(
    "q52_langid",
    (s, dir) => {
      val ex = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
      val scored = ex.groupBy(col("doc_id"), col("lang")).agg(
        sum(when(col("word").isin("customer", "data", "batch"), 1).otherwise(0)).as("s_de"),
        sum(when(col("word").isin("group", "fast", "hash"), 1).otherwise(0)).as("s_en"),
        sum(when(col("word").isin("filter", "stream", "query"), 1).otherwise(0)).as("s_es"),
        sum(when(col("word").isin("line", "small", "key"), 1).otherwise(0)).as("s_fr"),
        sum(when(col("word").isin("vector", "join", "merge"), 1).otherwise(0)).as("s_zh"))
      scored.withColumn("pred_lang",
          when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
            col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), "de")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_zh"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          (col("pred_lang") === col("lang")).as("correct"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH ex AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents),
      scored AS (SELECT doc_id, lang,
        sum(CASE WHEN word IN ('customer', 'data', 'batch') THEN 1 ELSE 0 END) AS s_de,
        sum(CASE WHEN word IN ('group', 'fast', 'hash') THEN 1 ELSE 0 END) AS s_en,
        sum(CASE WHEN word IN ('filter', 'stream', 'query') THEN 1 ELSE 0 END) AS s_es,
        sum(CASE WHEN word IN ('line', 'small', 'key') THEN 1 ELSE 0 END) AS s_fr,
        sum(CASE WHEN word IN ('vector', 'join', 'merge') THEN 1 ELSE 0 END) AS s_zh
        FROM ex GROUP BY doc_id, lang)
      SELECT doc_id, lang, pred_lang, pred_lang = lang AS correct FROM (
        SELECT doc_id, lang, CASE
          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
          WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
          WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
          WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS pred_lang
        FROM scored) x ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q53 — document fingerprint: order-sensitive rolling hash over the
  // word sequence (word code = char fold; doc fp = fold of word codes).
  private val q53 = QueryDef(
    "q53_fingerprint",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          expr(s"""aggregate(transform(words, w -> ${wordCodeSpark("w")}),
            CAST(0 AS BIGINT), (acc, c) -> (acc * 131 + c) % 1000000007)""").as("fingerprint"),
          size(col("words")).as("n_words"))
        .orderBy(col("doc_id")),
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(words, w -> ${wordCodeDuck("w")})),
          (acc, c) -> (acc * 131 + c) % 1000000007) AS fingerprint,
        len(words) AS n_words
      FROM w ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q54 — TF-IDF top terms per document. idf is the rational N/df (no
  // log: libm implementations differ between engines; the rational form
  // is bit-deterministic and rank-equivalent for ranking purposes).
  private val q54 = QueryDef(
    "q54_tfidf",
    (s, dir) => {
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      val docLen = words.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
      val df_ = words.select(col("doc_id"), col("word")).distinct()
        .groupBy(col("word")).agg(count(lit(1)).as("df"))
      val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("word"))
      tf.join(docLen, "doc_id").join(broadcast(df_), "word").crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          (col("cnt").cast("double") / col("n_tok")) *
            (col("n_docs").cast("double") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("word"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      tf AS (SELECT doc_id, word, count(*) AS cnt FROM words GROUP BY doc_id, word),
      doclen AS (SELECT doc_id, count(*) AS n_tok FROM words GROUP BY doc_id),
      dfreq AS (SELECT word, count(*) AS df FROM
        (SELECT DISTINCT doc_id, word FROM words) x GROUP BY word),
      ndocs AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, word, tfidf, rank FROM (
        SELECT tf.doc_id, tf.word,
          (CAST(cnt AS DOUBLE) / n_tok) * (CAST(n_docs AS DOUBLE) / df) AS tfidf,
          row_number() OVER (PARTITION BY tf.doc_id ORDER BY
            (CAST(cnt AS DOUBLE) / n_tok) * (CAST(n_docs AS DOUBLE) / df) DESC,
            tf.word) AS rank
        FROM tf JOIN doclen ON tf.doc_id = doclen.doc_id
        JOIN dfreq ON tf.word = dfreq.word CROSS JOIN ndocs) x
      WHERE rank <= 3 ORDER BY doc_id, rank"""))

  // --------------------------------------------------------------------
  // q55 — corpus-level n-gram frequency table (top 50 word bigrams).
  private val q55 = QueryDef(
    "q55_ngram_freq",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(explode(expr(
          """transform(sequence(1, size(words) - 1),
             i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"""))
          .as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(50),
    Some("""SELECT bigram, count(*) AS freq FROM (
        SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bigram
        FROM documents) x
      GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 50"""))

  // --------------------------------------------------------------------
  // q56 — heavy-hitter tokens via the Misra–Gries typed Aggregator
  // (§2.D custom aggregate in the query surface). MG estimates are
  // partitioning-dependent, but its GUARANTEE is deterministic: every
  // item with true frequency > n/(k+1) survives in a k-counter summary.
  // So the hashable output is the candidate set verified against exact
  // counts at threshold n/k — the sketch prunes 6k+ distinct tokens to
  // 32 candidates (the 100-TB play: the exact re-count is a semi-join
  // on a tiny broadcast key set, never a full-vocabulary aggregation),
  // and the final set equals DuckDB's plain GROUP BY ... HAVING.
  private val q56 = QueryDef(
    "q56_heavy_hitter_sources",
    (s, dir) => {
      import s.implicits._
      val k = 32
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
      // grand total WITHOUT exploding: Σ per-doc token counts — a
      // single columnar scan with a codegen size(split(...)), no
      // shuffle beyond the 1-row agg
      val total = t(s, dir, "documents")
        .agg(sum(size(split(col("text"), " ")))).first().getLong(0)
      val sketch = toks.as[String]
        .select(new graft.functions.HeavyHitters(k).toColumn_.name("sketch"))
      val candidates = sketch
        .select(explode(col("sketch")).as(Seq("token", "est_count")))
        .select(col("token"))
      // semi-join BEFORE the aggregation: only candidate tokens enter
      // the count shuffle (≤k keys), never the full vocabulary
      toks.join(broadcast(candidates), Seq("token"), "left_semi")
        .groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
        .filter(col("n_tok") > lit(total / 32.0))
        .orderBy(col("n_tok").desc, col("token"))
    },
    Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
        FROM documents)
      SELECT token, CAST(count(*) AS BIGINT) AS n_tok FROM toks
      GROUP BY token
      HAVING count(*) > (SELECT count(*) FROM toks) / 32.0
      ORDER BY n_tok DESC, token"""))

  // --------------------------------------------------------------------
  // q100 — bigram-LM familiarity scoring: the perplexity-filter step of
  // CCNet/Dolma-style quality pipelines, arithmetized for an exact
  // oracle. Each document is scored by how familiar its word bigrams
  // are to the corpus-level bigram model: `avg_bf` = mean corpus
  // frequency of the doc's bigram instances (natural text is built
  // from common bigrams; machine noise isn't), `novelty` = fraction of
  // bigram instances that occur in NO other document. Deliberately NO
  // log-probs: transcendental functions and float sums diverge across
  // engines, so every aggregate here is an INTEGER sum with one final
  // double division per output column — the driver's hash compare
  // stays exact.
  // Scale: tokens → per-doc bigram counts (keyed shuffle with map-side
  // combine), the corpus model derives FROM those counts (second,
  // smaller shuffle), model joins back on the bigram key (keyed
  // shuffle join — nothing corpus-sized broadcasts), then one per-doc
  // aggregation. The model is reused from the same frame, not
  // recomputed from raw text.
  private val q100 = QueryDef(
    "q100_lm_familiarity",
    (s, dir) => {
      val bigrams = t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(words) - 1),
             i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"""))
          .as("bigram"))
      val perDoc = bigrams.groupBy(col("doc_id"), col("bigram"))
        .agg(count(lit(1)).as("k"))
      val model = perDoc.groupBy(col("bigram")).agg(sum(col("k")).as("cb"))
      perDoc.join(model, "bigram")
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_bigrams"),
          sum(col("k") * col("cb")).as("sum_bf"),
          sum(when(col("cb") === col("k"), col("k")).otherwise(lit(0L)))
            .as("n_novel"))
        .withColumn("avg_bf", col("sum_bf").cast("double") / col("n_bigrams"))
        .withColumn("novelty", col("n_novel").cast("double") / col("n_bigrams"))
        .orderBy(col("avg_bf").asc, col("doc_id"))
        .limit(200)
        .select(col("doc_id"), col("n_bigrams"), col("sum_bf"),
          col("avg_bf"), col("novelty"))
    },
    Some("""WITH bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bigram
        FROM documents),
      perdoc AS (SELECT doc_id, bigram, count(*) AS k FROM bg GROUP BY doc_id, bigram),
      model AS (SELECT bigram, CAST(sum(k) AS BIGINT) AS cb FROM perdoc GROUP BY bigram)
      SELECT doc_id, n_bigrams, sum_bf,
        CAST(sum_bf AS DOUBLE) / n_bigrams AS avg_bf,
        CAST(n_novel AS DOUBLE) / n_bigrams AS novelty
      FROM (
        SELECT p.doc_id, CAST(sum(p.k) AS BIGINT) AS n_bigrams,
          CAST(sum(p.k * m.cb) AS BIGINT) AS sum_bf,
          CAST(sum(CASE WHEN m.cb = p.k THEN p.k ELSE 0 END) AS BIGINT) AS n_novel
        FROM perdoc p JOIN model m ON p.bigram = m.bigram
        GROUP BY p.doc_id) x
      ORDER BY avg_bf ASC, doc_id LIMIT 200"""))

  val defs: Seq[QueryDef] =
    Seq(q50, q51, q52, q53, q54, q55, q56, q100)
}
