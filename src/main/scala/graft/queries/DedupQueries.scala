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
  * - exact Jaccard pairs: implementation chosen by corpus statistics
  *   (see exactJaccardPairs) — broadcast pair scan over hashed code
  *   sets here because every shingle is hot in this corpus; on a
  *   sparse corpus the shingle-inverted-index join + prefix filtering
  *   wins instead. Either way q63's MinHash-LSH is the sub-quadratic
  *   scale path.
  * - MinHash/LSH: O(n) signature computation + join on (band, value) —
  *   the standard sub-quadratic near-dup pipeline.
  * - clustering (q66): connected components with a size-based algorithm
  *   switch (driver union-find vs distributed label propagation).
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
  // q61 — n-gram Jaccard near-dup pairs: word-bigram shingles, exact
  // Jaccard ≥ 0.08 over hashed shingle sets.
  /** Shared by q61/q66: exact bigram-Jaccard pairs ≥ 0.08, routed by
    * MEASURED corpus density ([[graft.operators.Operators
    * .jaccardPairsAuto]]): this corpus's tiny hot shingle vocabulary
    * makes the inverted-index self-join materialize Σ df² ≈ 600M
    * candidates at sf0.1 (measured 34s), so the router picks the
    * broadcast pair scan with the codegen'd two-pointer merge
    * (~60 ns/pair, zero shuffles); on a sparse corpus the SAME call
    * routes to the ppjoin prefix join instead. q63's MinHash-LSH
    * remains the sub-quadratic scale path either way. */
  private def exactJaccardPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Operators.jaccardPairsAuto(
      codeSets(s, dir), "doc_id", "cs", tau = 0.08)

  /** DuckDB CTE fragment producing the exact pair set at `tau`. */
  private def pairsDuckAt(tau: Double): String =
    s"""$shingleCodesDuck,
      carr AS (SELECT doc_id, list_distinct(list(code)) AS cs FROM codes GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        CAST(len(list_intersect(a.cs, b.cs)) AS BIGINT) AS inter,
        CAST(len(list_intersect(a.cs, b.cs)) AS DOUBLE) /
          (len(a.cs) + len(b.cs) - len(list_intersect(a.cs, b.cs))) AS jaccard
      FROM carr a JOIN carr b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.cs, b.cs)) AS DOUBLE) /
          (len(a.cs) + len(b.cs) - len(list_intersect(a.cs, b.cs))) >= $tau)"""

  /** The q61/q66 pair set (`pairs`). */
  private lazy val pairsDuck: String = pairsDuckAt(0.08)

  private val q61 = QueryDef(
    "q61_jaccard_pairs",
    (s, dir) => exactJaccardPairs(s, dir).orderBy(col("a_id"), col("b_id")),
    Some(s"""WITH $pairsDuck
      SELECT a_id, b_id, inter, jaccard FROM pairs ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q66 — near-dup clustering: connected components over the Jaccard
  // pair graph; cluster id = min doc_id in the component (the canonical
  // document a dedup pipeline would keep). Spark side runs the
  // iterative min-label propagation operator; the oracle states the
  // same fixed point as a recursive transitive closure.
  private val q66 = QueryDef(
    "q66_dedup_clusters",
    (s, dir) =>
      graft.operators.Operators.connectedComponents(
        exactJaccardPairs(s, dir).select(col("a_id"), col("b_id")),
        "a_id", "b_id", maxIter = 50)
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $pairsDuck,
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      SELECT src AS doc_id, least(src, min(dst)) AS cluster
      FROM reach GROUP BY src ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q62 — MinHash signatures: 8 permutations over the bigram-shingle
  // code set (min is order-free, exact integer arithmetic). Bigram
  // shingles (same as q61) keep inter-document Jaccard discriminative —
  // unigram sets on this corpus are near-identical across documents,
  // which would make every pair an LSH candidate (measured: 83k of 125k
  // pairs at sf0.01, quadratic blowup at scale).
  private def sigSelectSpark: Seq[Column] =
    A.indices.map(i => min(expr(s"(${A(i)} * code + ${B(i)}) % $P")).as(s"mh$i"))
  private def sigSelectDuck: String =
    A.indices.map(i => s"min((${A(i)} * code + ${B(i)}) % $P) AS mh$i").mkString(", ")

  /** Distinct word-bigram shingles per doc with their integer codes. */
  /** Per-doc sorted distinct bigram-shingle code array — ONE codegen
    * call per document ([[graft.functions.ShingleCodeSet]]); replaces
    * the round-1 explode→HOF-transform→distinct→hash pipeline whose
    * interpreted lambdas dominated every dedup query (3.5s of q63's
    * 4.8s at sf0.1). */
  private def codeSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), expr("shingle_code_set(text)").as("cs"))

  /** Exploded (doc_id, code) rows off the cheap code-set array — the
    * shape the MinHash signature aggregation consumes. */
  private def shingleCodes(s: SparkSession, dir: String): DataFrame =
    codeSets(s, dir).select(col("doc_id"), explode(col("cs")).as("code"))

  private lazy val shingleCodesDuck: String =
    s"""codes AS (SELECT doc_id, sh, ${wordCodeDuck("sh")} AS code FROM (
        SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
          range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))) AS sh
        FROM documents) t)"""

  private val q62 = QueryDef(
    "q62_minhash_sig",
    (s, dir) =>
      shingleCodes(s, dir)
        .groupBy(col("doc_id"))
        .agg(sigSelectSpark.head, sigSelectSpark.tail: _*)
        .orderBy(col("doc_id")),
    Some(s"""WITH $shingleCodesDuck
      SELECT doc_id, $sigSelectDuck FROM codes GROUP BY doc_id ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q63 — LSH candidate pairs: 4 bands × 2 rows over the q62 signature;
  // pairs sharing ≥1 band get their exact bigram Jaccard computed via
  // per-doc sorted code-set arrays + the codegen two-pointer intersect
  // (no second exploded join) and are kept at ≥ 0.05. Sub-quadratic:
  // the only shuffles are the (band, value) self-join and the two
  // array-fetch joins.
  private val q63 = QueryDef(
    "q63_minhash_lsh_pairs",
    (s, dir) => {
      // materialized once: consumed by the signature aggregation and
      // both code-set fetch joins — 3 evaluations without it
      val sets = codeSets(s, dir).localCheckpoint()
      val codes = sets.select(col("doc_id"), explode(col("cs")).as("code"))
      val sig = codes.groupBy(col("doc_id"))
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
      cand
        .join(sets.select(col("doc_id").as("a_id"), col("cs").as("sa")), "a_id")
        .join(sets.select(col("doc_id").as("b_id"), col("cs").as("sb")), "b_id")
        .withColumn("inter", expr("sorted_intersect_count(sa, sb)"))
        .withColumn("jaccard", col("inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("inter")))
        .filter(col("jaccard") >= 0.05)
        .select(col("a_id"), col("b_id"), col("inter").cast("long").as("inter"),
          col("jaccard"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""WITH $shingleCodesDuck,
      sig AS (SELECT doc_id, $sigSelectDuck FROM codes GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band, mh0 * $P + mh1 AS v FROM sig UNION ALL
        SELECT doc_id, 1, mh2 * $P + mh3 FROM sig UNION ALL
        SELECT doc_id, 2, mh4 * $P + mh5 FROM sig UNION ALL
        SELECT doc_id, 3, mh6 * $P + mh7 FROM sig),
      cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x JOIN bands y ON x.band = y.band AND x.v = y.v
          AND x.doc_id < y.doc_id),
      sharr AS (SELECT doc_id, list_distinct(list(code)) AS shs FROM codes GROUP BY doc_id),
      scored AS (SELECT a_id, b_id,
          len(list_intersect(sa.shs, sb.shs)) AS inter,
          CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE) /
            (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))) AS jaccard
        FROM cand JOIN sharr sa ON a_id = sa.doc_id JOIN sharr sb ON b_id = sb.doc_id)
      SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter, jaccard FROM scored
      WHERE jaccard >= 0.05 ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q64 — SimHash: 31-bit signature from occurrence-weighted word-code
  // bits (exact integer netsums; bit j set iff netsum_j > 0).
  //
  // Plan shape (round-5 verdict follow-up): the original formulation
  // exploded each (doc, word) row ×31 bit positions — a 31× row
  // fan-out before the first shuffle plus a SECOND doc-keyed shuffle
  // to fold bits into the signature. Re-expressed as 31 independent
  // `sum` aggregates in ONE hash aggregation: the 31 netsums ride the
  // aggregation buffer instead of 31 rows, every shift/mask stays
  // inside whole-stage codegen, partial aggregation combines map-side,
  // and the signature fold is a scalar projection over the agg output.
  // Beats both the explode AND a custom object-typed aggregate (which
  // would leave the codegen'd columnar path for ObjectHashAggregate).
  private val q64 = QueryDef(
    "q64_simhash",
    (s, dir) => {
      val wc = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
        .withColumn("code", expr(wordCodeSpark("word")))
      val nets = (0 to 30).map { j =>
        sum(col("cnt") *
          ((shiftright(col("code"), j).bitwiseAND(lit(1L))) * 2 - 1)).as(s"__n$j")
      }
      val sig = (0 to 30).map { j =>
        when(col(s"__n$j") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      wc.groupBy(col("doc_id")).agg(nets.head, nets.tail: _*)
        .select(col("doc_id"), sig.cast("long").as("simhash"))
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
        CAST(sum(CASE WHEN net > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id ORDER BY doc_id"""))

  // --------------------------------------------------------------------
  // q65 — edit-distance near-dup pairs over a bounded slice: both
  // engines implement the identical integer Levenshtein DP.
  private val q65 = QueryDef(
    "q65_edit_distance",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_partkey") < 300)
        .select(col("p_partkey"), col("p_name"))
      val a = p.select(col("p_partkey").as("a_id"), col("p_name").as("a_name"))
      val b = p.select(col("p_partkey").as("b_id"), col("p_name").as("b_name"))
      broadcast(a).join(b, col("a_id") < col("b_id"))
        .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
        .filter(col("dist") <= 4)
        .select(col("a_id"), col("b_id"), col("dist"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
      levenshtein(a.p_name, b.p_name) AS dist
      FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      WHERE a.p_partkey < 300 AND b.p_partkey < 300
        AND levenshtein(a.p_name, b.p_name) <= 4
      ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q89 — prefix-filtered inverted-index Jaccard pairs
  // ([[graft.operators.Operators.jaccardPairsPrefix]]): the SPARSE-
  // corpus counterpart of q61's broadcast pair scan, at the near-dup
  // threshold τ=0.5 where the prefix filter indexes only half of each
  // set. Same exact semantics as q61's formulation, different plan
  // shape: every stage is a keyed shuffle, nothing is broadcast.
  private val q89 = QueryDef(
    "q89_jaccard_prefix",
    (s, dir) =>
      graft.operators.Operators.jaccardPairsPrefix(
        codeSets(s, dir), "doc_id", "cs", 0.5)
        .orderBy(col("a_id"), col("b_id")),
    Some(s"""WITH ${pairsDuckAt(0.5)}
      SELECT a_id, b_id, inter, jaccard FROM pairs ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q69 — quality-aware canonical selection: the "which copy do we
  // keep" step that follows near-dup clustering in every curation
  // pipeline. q66 names the min-id member canonical; real pipelines
  // keep the BEST member instead — here the longest document (token
  // count as the quality proxy, lowest doc_id as the deterministic
  // tie-break), reporting per cluster the keeper and the token mass
  // dedup would drop. Clusters come from the STRONG near-dup graph
  // (τ=0.5, q89's pair set) — the regime where merging copies is
  // actually safe; the dense τ=0.08 graph (q66) percolates into giant
  // components whose "canonical member" is not a meaningful keep
  // decision (and whose transitive-closure oracle costs 400+ s in
  // DuckDB at sf0.1 vs ~25 s for the τ=0.5 graph).
  //
  // Scale design: cluster assignment comes from the bounded-iteration
  // min-label operator (keyed shuffles only); the argmax is ONE
  // aggregation via lexicographic struct-max — max(struct(quality,
  // -id)) — never a per-cluster window sort, so per-group state is
  // O(1) and map-side combine applies. Joins key on doc_id/cluster;
  // nothing corpus-sized is broadcast or collected.
  private val q69 = QueryDef(
    "q69_canonical_selection",
    (s, dir) => {
      val comp = graft.operators.Operators.connectedComponents(
        graft.operators.Operators.jaccardPairsAuto(
          codeSets(s, dir), "doc_id", "cs", tau = 0.5)
          .select(col("a_id"), col("b_id")),
        "a_id", "b_id", maxIter = 50)
        .select(col("id").as("doc_id"), col("cluster"))
      val tok = t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      comp.join(tok, "doc_id")
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("n_tokens")).as("total_tokens"),
          max(struct(col("n_tokens").as("t"), (-col("doc_id")).as("neg")))
            .as("m"))
        .select(col("cluster"), col("n_members"), col("total_tokens"),
          (-col("m.neg")).as("keep_id"), col("m.t").as("keep_tokens"),
          (col("total_tokens") - col("m.t")).as("dropped_tokens"))
        .orderBy(col("cluster"))
    },
    Some(s"""WITH RECURSIVE ${pairsDuckAt(0.5)},
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster
        FROM reach GROUP BY src),
      tok AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      m AS (SELECT c.cluster, c.doc_id, t.n_tokens
        FROM comp c JOIN tok t USING (doc_id)),
      r AS (SELECT cluster, doc_id, n_tokens, row_number() OVER (
          PARTITION BY cluster ORDER BY n_tokens DESC, doc_id ASC) AS rn
        FROM m),
      agg AS (SELECT cluster, count(*) AS n_members,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM m GROUP BY cluster)
      SELECT a.cluster, a.n_members, a.total_tokens, k.doc_id AS keep_id,
        k.n_tokens AS keep_tokens,
        a.total_tokens - k.n_tokens AS dropped_tokens
      FROM agg a JOIN (SELECT * FROM r WHERE rn = 1) k USING (cluster)
      ORDER BY cluster"""))

  val defs: Seq[QueryDef] = Seq(q60, q61, q62, q63, q64, q65, q66, q69, q89)
}
