package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw crawl and tokenizer: exact substring-level dedup (the
  * word-n-gram miniature of suffix-array dedup — find every n-gram
  * shared across documents and measure how much of each document it
  * covers), benchmark decontamination (drop/flag training docs that
  * share an n-gram with an eval set), and within-document repetition
  * metrics (the classic quality-filter family: duplicate-n-gram
  * fraction and top-n-gram mass).
  *
  * Scale design: q92's only shuffles are keyed on the gram hash and on
  * doc_id — both linear in corpus size, no pair join and no broadcast
  * of anything corpus-sized. q93 broadcasts ONLY the benchmark gram
  * set, which is small by construction (eval sets are MBs, corpora are
  * TBs) — the contamination check is then a map-side semi-join. q94 is
  * pure narrow per-document compute: the n-gram statistics come from
  * array HOFs inside one projection, zero shuffles before the final
  * order.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Word n-grams with their 1-based start position. Guarded for short
    * docs (sequence(1, n) with n < 1 would generate a DESCENDING range
    * in Spark, not an empty one). */
  private def gramsWithPos(s: SparkSession, dir: String, k: Int): DataFrame =
    t(s, dir, "documents")
      // see q94: spread the compute-dense gram explode before it runs
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("n_words"), posexplode(expr(
        s"""CASE WHEN size(w) < $k THEN array()
            ELSE transform(sequence(1, size(w) - ${k - 1}),
                   i -> array_join(slice(w, i, $k), ' ')) END"""))
        .as(Seq("p", "g")))
      .select(col("doc_id"), col("n_words"), (col("p") + 1).as("start"), col("g"))

  /** DuckDB fragment producing the same (doc_id, n_words, start, g)
    * set; range(a, b) is already empty when b <= a. */
  private def gramsDuck(k: Int): String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      grams AS (SELECT doc_id, len(w) AS n_words, i AS start,
          array_to_string(w[i:i+${k - 1}], ' ') AS g
        FROM w, LATERAL (SELECT unnest(range(1, len(w) - ${k - 2})) AS i))"""

  // --------------------------------------------------------------------
  // q92 — exact substring dedup at word-8-gram granularity (the
  // distributable miniature of suffix-array substring dedup): an 8-gram
  // occurring in 2+ distinct documents is "duplicated text"; per
  // document, count duplicated gram positions, the distinct word
  // positions they cover, and the words that would survive removal.
  private val q92 = QueryDef(
    "q92_substring_dedup",
    (s, dir) => {
      val grams = gramsWithPos(s, dir, 8)
      // global duplicated-gram set: one keyed shuffle on the gram
      val dup = grams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("g"))
      val hits = grams.join(dup, "g")
        .select(col("doc_id"), col("start")).distinct()
      val perDoc = hits.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dup_positions"))
      val covered = hits
        .select(col("doc_id"), explode(sequence(col("start"), col("start") + 7))
          .as("idx"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("covered_words"))
      t(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_words"))
        .join(perDoc, Seq("doc_id"), "left")
        .join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          coalesce(col("dup_positions"), lit(0L)).as("dup_positions"),
          coalesce(col("covered_words"), lit(0L)).as("covered_words"),
          (col("n_words") - coalesce(col("covered_words"), lit(0L)))
            .as("kept_words"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${gramsDuck(8)},
      dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      hits AS (SELECT DISTINCT g2.doc_id, g2.start FROM grams g2 JOIN dup USING (g)),
      per_doc AS (SELECT doc_id, count(*) AS dup_positions FROM hits GROUP BY doc_id),
      cov AS (SELECT doc_id, count(DISTINCT idx) AS covered_words FROM hits,
        LATERAL (SELECT unnest(range(start, start + 8)) AS idx) GROUP BY doc_id)
      SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_words,
        CAST(coalesce(p.dup_positions, 0) AS BIGINT) AS dup_positions,
        CAST(coalesce(cov.covered_words, 0) AS BIGINT) AS covered_words,
        len(string_split(d.text, ' ')) - CAST(coalesce(cov.covered_words, 0) AS BIGINT)
          AS kept_words
      FROM documents d
      LEFT JOIN per_doc p USING (doc_id) LEFT JOIN cov USING (doc_id)
      ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q93 — benchmark decontamination: docs with doc_id % 7 = 0 stand in
  // for the held-out eval set; every other document sharing at least
  // one word-8-gram with it is contaminated. Reports the contaminated
  // docs with their distinct-gram count, shared-gram count, and
  // contamination share. (Oracle shared with q96, which produces the
  // same result through the Bloom-prefiltered path.)
  private val decontamOracle: String =
    s"""WITH ${gramsDuck(8)},
      dg AS (SELECT DISTINCT doc_id, g FROM grams),
      bench AS (SELECT DISTINCT g FROM dg WHERE doc_id % 7 = 0),
      train AS (SELECT doc_id, g FROM dg WHERE doc_id % 7 <> 0),
      per_doc AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id),
      shared AS (SELECT doc_id, count(*) AS n_shared
        FROM train JOIN bench USING (g) GROUP BY doc_id)
      SELECT s.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams,
        CAST(s.n_shared AS BIGINT) AS n_shared,
        CAST(s.n_shared AS DOUBLE) / p.n_grams AS share
      FROM shared s JOIN per_doc p USING (doc_id) ORDER BY doc_id"""

  private val q93 = QueryDef(
    "q93_decontamination",
    (s, dir) => {
      val grams = gramsWithPos(s, dir, 8)
        .select(col("doc_id"), col("g")).distinct()
      val bench = grams.filter(col("doc_id") % 7 === 0)
        .select(col("g")).distinct()
      val train = grams.filter(col("doc_id") % 7 =!= 0)
      val perDoc = train.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      // the eval-set gram list is the ONLY broadcast — small by nature
      val shared = train.join(broadcast(bench), "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      shared.join(perDoc, "doc_id")
        .select(col("doc_id"), col("n_grams"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_grams")).as("share"))
        .orderBy(col("doc_id"))
    },
    Some(decontamOracle))

  // --------------------------------------------------------------------
  // q94 — within-document repetition metrics (the Gopher-style quality
  // rules): duplicate word-bigram fraction and the mass of the single
  // most frequent bigram. All statistics come from array HOFs in one
  // projection — per-document narrow compute, no explode, no shuffle
  // until the final presentation sort.
  private val q94 = QueryDef(
    "q94_repetition_metrics",
    (s, dir) =>
      t(s, dir, "documents")
        // compute-dense narrow map: bytes-based split sizing gives a
        // handful of partitions for a corpus whose per-row COMPUTE, not
        // size, is the cost — spread it across the cluster explicitly
        // (at production scale file granularity already does this)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        // zip_with over the materialized words array: a lambda that
        // calls element_at(split(text), i) re-splits the WHOLE text
        // once per element — O(n²·len) per doc, measured 5× on this
        // query at sf0.1
        .select(col("doc_id"), expr(
          """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
             (x, y) -> concat(x, ' ', y))""").as("b"))
        .select(col("doc_id"),
          size(col("b")).as("n_bigrams"),
          size(array_distinct(col("b"))).as("n_distinct"),
          // max multiplicity = longest equal run of the SORTED array —
          // an O(n log n) fold; the direct transform+filter counting
          // form is O(distinct·n) per document and measured 8× slower
          // at sf0.1 (7.5s → <1s). '' is never a bigram, so it is a
          // safe initial prev.
          expr("""aggregate(array_sort(b),
              named_struct('prev', '', 'run', 0, 'best', 0),
              (a, x) -> named_struct(
                'prev', x,
                'run', IF(x = a.prev, a.run + 1, 1),
                'best', GREATEST(a.best, IF(x = a.prev, a.run + 1, 1))),
              a -> a.best)""").as("top_count"))
        .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"))
            .as("dup_frac"),
          col("top_count"),
          (col("top_count").cast("double") / col("n_bigrams")).as("top_frac"))
        .orderBy(col("doc_id")),
    Some("""WITH b AS (SELECT doc_id,
        list_transform(range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]) AS b
      FROM documents)
      SELECT doc_id, n_bigrams, n_distinct,
        1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams AS dup_frac,
        top_count, CAST(top_count AS DOUBLE) / n_bigrams AS top_frac
      FROM (SELECT doc_id, len(b) AS n_bigrams, len(list_distinct(b)) AS n_distinct,
        list_max(list_transform(list_distinct(b), x -> len(list_filter(b, y -> y = x)))) AS top_count
        FROM b) x ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q96 — the SAME decontamination result as q93, produced through
  // [[graft.operators.Operators.semiJoinBloom]]: a distributively-built
  // Bloom sketch of the eval grams prefilters the corpus grams BEFORE
  // any join shuffle (codegen probe, no false negatives), then the
  // exact semi-join removes the false positives. q93's exact broadcast
  // works while eval gram sets fit in a broadcast; this is the shape
  // that survives when they do not — only the sketch's bits travel, and
  // the join shuffles survivors, not the corpus. Same oracle SQL as
  // q93, so the driver gate proves bloom-prefiltered ≡ exact.
  private val q96 = QueryDef(
    "q96_decontam_bloom",
    (s, dir) => {
      val grams = gramsWithPos(s, dir, 8)
        .select(col("doc_id"), col("g")).distinct()
        // the gram explode feeds per-doc counts, the sketch build
        // (itself two passes: size + aggregate), and both join sides —
        // materialize it once
        .localCheckpoint()
      val bench = grams.filter(col("doc_id") % 7 === 0).select(col("g"))
      val train = grams.filter(col("doc_id") % 7 =!= 0)
      val perDoc = train.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      val shared = graft.operators.Operators
        .semiJoinBloom(train, "g", bench, "g", fpp = 0.01)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      shared.join(perDoc, "doc_id")
        .select(col("doc_id"), col("n_grams"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_grams")).as("share"))
        .orderBy(col("doc_id"))
    },
    Some(decontamOracle))

  // --------------------------------------------------------------------
  // q68 — PII detection + redaction (the C4/Dolma/FineWeb-style scrub
  // step between crawl and tokenizer): count email / phone / IP spans
  // per document and emit the redacted text's fingerprint. The corpus
  // is synthetic word salad, so PII spans are planted deterministically
  // from doc_id (identically on both engines — the oracle then verifies
  // detection AND redaction byte-for-byte via md5): docs ≡0 mod 3 get
  // an email, ≡0 mod 5 a NANP phone, ≡0 mod 7 a dotted-quad IP.
  //
  // Scale design: the scrub itself is [[graft.operators.Operators
  // .piiScrub]] — pure narrow per-document compute, three regex scans
  // and three replaces inside one codegen'd projection, zero shuffles
  // before the presentation sort. The default rules' regex subset
  // (classes, bounded repetition, literals) behaves identically under
  // Java regex and RE2, which is what makes the md5 cross-engine check
  // possible.
  private val EmailRe =
    graft.operators.Operators.DefaultPiiRules(0).regex
  private val PhoneRe =
    graft.operators.Operators.DefaultPiiRules(1).regex
  private val IpRe =
    graft.operators.Operators.DefaultPiiRules(2).regex

  private val q68 = QueryDef(
    "q68_pii_redaction",
    (s, dir) => {
      val aug = t(s, dir, "documents")
        // compute-dense narrow map (six regex passes per doc): spread
        // it like q94 — at production scale file granularity does this
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), concat(
          col("text"),
          when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
            col("doc_id").cast("string"), lit("@mail.example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, concat(lit(" call +1-202-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, concat(lit(" host 10."),
            (col("doc_id") % 256).cast("string"), lit(".0."),
            ((col("doc_id") * 7) % 256).cast("string")))
            .otherwise(lit(""))).as("aug"))
      // redaction order: emails first (their local parts may contain
      // digits), then phones, then IPs; the <TAG> placeholders cannot
      // re-match any pattern, so the chain is confluent.
      graft.operators.Operators.piiScrub(aug, "aug", outCol = "red")
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          col("n_ips"),
          (col("n_emails") + col("n_phones") + col("n_ips")).as("pii_total"),
          (col("n_emails") + col("n_phones") + col("n_ips") === 0)
            .as("is_clean"),
          length(col("red")).cast("long").as("redacted_len"),
          md5(col("red")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH aug AS (SELECT doc_id, text
        || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' call +1-202-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
        AS aug FROM documents),
      red AS (SELECT doc_id, aug,
        regexp_replace(regexp_replace(regexp_replace(aug,
          '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'),
          '$IpRe', '<IP>', 'g') AS red FROM aug)
      SELECT doc_id,
        CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(aug, '$IpRe')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(aug, '$EmailRe')) + len(regexp_extract_all(aug, '$PhoneRe')) + len(regexp_extract_all(aug, '$IpRe')) AS BIGINT) AS pii_total,
        len(regexp_extract_all(aug, '$EmailRe')) + len(regexp_extract_all(aug, '$PhoneRe')) + len(regexp_extract_all(aug, '$IpRe')) = 0 AS is_clean,
        CAST(length(red) AS BIGINT) AS redacted_len,
        md5(red) AS redacted_md5
      FROM red ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q101 — per-source capping (the domain-balancing step of C4/Dolma
  // curation: no single domain may dominate the mixture). Keep the 50
  // longest documents per source (token count desc, doc_id tie-break)
  // and account the dropped token mass per source.
  // Scale: ONE aggregation keyed on source — the bounded [[TopK]]
  // Aggregator holds k rows per group with map-side combine, so the
  // shuffle carries per-partition k-row sketches + partial sums, never
  // document rows. The oracle's window formulation would shuffle and
  // sort EVERY document by source; that is exactly the plan this query
  // exists to avoid (PlanSpec locks the no-Window shape). Kept-mass
  // arithmetic: token counts are exact integers (< 2^53) riding in the
  // sketch's double scores, folded in fixed array order — the final
  // BIGINT cast is exact, and drop_share is two IEEE ops on exact
  // inputs, so the driver hash-compare holds.
  private val q101 = QueryDef(
    "q101_source_cap",
    (s, dir) => {
      val k = 50
      val docs = t(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          col("doc_id"))
      val tk = graft.functions.TopK.topk(k)
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tok_total"),
          tk(col("toks").cast("double"), col("doc_id")).as("kept"))
        .select(col("source"), col("n_docs"), col("tok_total"),
          size(col("kept")).cast("long").as("n_kept"),
          expr("CAST(aggregate(kept, 0.0D, (acc, x) -> acc + x.score) AS BIGINT)")
            .as("tok_kept"))
        .withColumn("drop_share",
          lit(1.0) - col("tok_kept").cast("double") / col("tok_total"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
        SELECT source, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        FROM documents),
      r AS (SELECT source, doc_id, toks,
        row_number() OVER (PARTITION BY source
          ORDER BY toks DESC, doc_id ASC) AS rn FROM d)
      SELECT source, n_docs, tok_total, n_kept, tok_kept,
        1.0 - CAST(tok_kept AS DOUBLE) / tok_total AS drop_share
      FROM (
        SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(toks) AS BIGINT) AS tok_total,
          CAST(sum(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(sum(CASE WHEN rn <= 50 THEN toks ELSE 0 END) AS BIGINT) AS tok_kept
        FROM r GROUP BY source) x
      ORDER BY source"""))

  val defs: Seq[QueryDef] = Seq(q68, q92, q93, q94, q96, q101)
}
