package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (Array[Float], 64-d):
  * brute-force cosine top-k as the correctness baseline, a
  * hyperplane-LSH bucketed variant as the scale path, and threshold
  * near-dup pairs.
  *
  * Determinism: cosine is computed as a strict left-to-right fold in
  * DOUBLE (Spark `aggregate` HOF ≡ DuckDB `list_reduce`), so both
  * engines produce bit-identical doubles — no tolerance needed in the
  * hash compare.
  *
  * Scale design: norms are precomputed once per vector (O(n) folds, not
  * O(n·k)); brute force is quadratic and exists as the oracle-checkable
  * baseline; the LSH variant joins on a 8-bit hyperplane bucket —
  * at 100 TB the bucket join is the only shuffle and candidate lists
  * shrink ~2^8 per probe.
  */
object SimilarityQueries {

  /** Spark side: the engine's native codegen [[graft.functions.VecDot]]
    * (bit-identical to the sequential HOF fold it replaced, ~25× faster
    * on the pair joins). Registered by SparkEntry.configure. */
  private def dotSpark(a: String, b: String): String = s"vec_dot($a, $b)"

  /** DuckDB: the same fold (1-based list indexing, seed prepended). */
  private def dotDuck(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(range(1, len($a) + 1),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
        (acc, v) -> acc + v)"""

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Vectors with precomputed L2 norm. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(expr(dotSpark("embedding", "embedding"))))

  private val normDuck =
    s"""vecs AS (SELECT vec_id, embedding,
        sqrt(${dotDuck("embedding", "embedding")}) AS nrm FROM embeddings)"""

  /** Brute-force top-5 oracle shared by q70 (brute Spark plan) and q97
    * (metric-pruned plan) — identical SQL, so the driver gate proves
    * pruned ≡ brute end-to-end. */
  private val knnOracle: String =
    s"""WITH $normDuck,
      sims AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
          ${dotDuck("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim
        FROM vecs q JOIN vecs c ON q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id)
      SELECT q_id, n_id, sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        FROM sims) x
      WHERE rank <= 5 ORDER BY q_id, rank"""

  // --------------------------------------------------------------------
  // q70 — brute-force cosine top-k: every 100th vector is a query; top-5
  // neighbors by (cosine desc, vec_id asc). The ranking runs through the
  // bounded-state [[graft.functions.TopK]] aggregator, not a window:
  // row_number() over all q×n candidate pairs shuffles and sorts the
  // ENTIRE similarity matrix, while the aggregator map-side-combines
  // each partition down to k rows per query before the (tiny) exchange.
  // Same exact rows — the (sim DESC, n_id ASC) order is total.
  private val q70 = QueryDef(
    "q70_knn_brute",
    (s, dir) => {
      val vecs = withNorm(t(s, dir, "embeddings"))
      val q = vecs.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val c = vecs.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"))
      val tk = graft.functions.TopK.topk(5)
      broadcast(q).join(c, col("q_id") =!= col("n_id"))
        .withColumn("sim",
          expr(dotSpark("q_emb", "n_emb")) / (col("q_nrm") * col("n_nrm")))
        .groupBy(col("q_id")).agg(tk(col("sim"), col("n_id")).as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("p", "s")))
        .select(col("q_id"), col("s.id").as("n_id"), col("s.score").as("sim"),
          (col("p") + 1).as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some(knnOracle))

  // --------------------------------------------------------------------
  // q71 — hyperplane-LSH ANN: 8 pseudo-random hyperplanes (deterministic
  // LCG coefficients), vectors bucketed by the 8-bit sign pattern;
  // queries search only their bucket; top-3 by cosine.
  private val planeCoef =
    "((CAST(1103515245 AS BIGINT) * (pl * 64 + (i - 1)) + 12345) % 2147483648) / 2147483648.0 - 0.5"

  private def planeDotSpark: String =
    s"""aggregate(transform(sequence(1, size(embedding)),
        i -> ($planeCoef) * CAST(element_at(embedding, i) AS DOUBLE)),
        CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""

  private def planeDotDuck: String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(range(1, len(embedding) + 1),
          i -> ($planeCoef) * CAST(embedding[i] AS DOUBLE))),
        (acc, v) -> acc + v)"""

  private val q71 = QueryDef(
    "q71_ann_lsh",
    (s, dir) => {
      // NOT checkpointed: the subtree is a parquet scan + one codegen
      // fold — recomputing it per consumer is cheaper than a
      // materialization round trip (measured 2×; contrast the dedup
      // pack, whose shingling subtree IS worth checkpointing)
      val vecs = withNorm(t(s, dir, "embeddings"))
      val buckets = vecs
        .select(col("vec_id"), col("embedding"), col("nrm"),
          explode(expr("sequence(0, 7)")).as("pl"))
        .withColumn("bit",
          when(expr(planeDotSpark) >= 0, expr("shiftleft(CAST(1 AS BIGINT), pl)"))
            .otherwise(0L))
        .groupBy(col("vec_id"))
        .agg(sum(col("bit")).as("bucket"))
      val bv = vecs.join(buckets, "vec_id")
      val q = bv.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("bucket"))
      val c = bv.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("bucket"))
      // bounded-state top-k per query (see q70) — candidates never
      // leave their partition unranked
      val tk = graft.functions.TopK.topk(3)
      broadcast(q).join(c, Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim",
          expr(dotSpark("q_emb", "n_emb")) / (col("q_nrm") * col("n_nrm")))
        .groupBy(col("q_id"), col("bucket"))
        .agg(tk(col("sim"), col("n_id")).as("tk"))
        .select(col("q_id"), col("bucket"), posexplode(col("tk")).as(Seq("p", "s")))
        .select(col("q_id"), col("s.id").as("n_id"), col("bucket"),
          col("s.score").as("sim"), (col("p") + 1).as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""WITH $normDuck,
      buckets AS (SELECT vec_id,
          CAST(sum(CASE WHEN $planeDotDuck >= 0
              THEN (CAST(1 AS BIGINT) << CAST(pl AS INT)) ELSE 0 END) AS BIGINT) AS bucket
        FROM vecs, (SELECT unnest(range(0, 8)) AS pl) p
        GROUP BY vec_id),
      bv AS (SELECT v.vec_id, v.embedding, v.nrm, b.bucket
        FROM vecs v JOIN buckets b ON v.vec_id = b.vec_id),
      sims AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, q.bucket AS bucket,
          ${dotDuck("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS sim
        FROM bv q JOIN bv c ON q.bucket = c.bucket
          AND q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id)
      SELECT q_id, n_id, bucket, sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        FROM sims) x
      WHERE rank <= 3 ORDER BY q_id, rank"""))

  // --------------------------------------------------------------------
  // q72 — cosine near-dup pairs above a threshold (brute-force baseline;
  // the LSH bucketing above is the scale path for this too).
  /** Shared by q72/q91: exact cosine pairs ≥ 0.4. */
  private def cosinePairs(s: SparkSession, dir: String): DataFrame = {
      val vecs = withNorm(t(s, dir, "embeddings"))
      val a = vecs.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("nrm").as("a_nrm"))
      val b = vecs.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm"))
      // sim test authored INSIDE the join condition, id test first — a
      // separate .filter is pushed in as the LEADING conjunct and the
      // codegen dot product then runs for all n² ordered pairs (same
      // finding as q61's pair scan)
      val sim = expr(dotSpark("a_emb", "b_emb")) / (col("a_nrm") * col("b_nrm"))
      a.join(b, col("a_id") < col("b_id") && sim >= 0.4)
        .withColumn("sim", sim)
        .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** DuckDB CTE fragment producing the same pair set (`pairs`). */
  private lazy val cosPairsDuck: String =
    s"""$normDuck,
      pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS sim
      FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
      WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4)"""

  private val q72 = QueryDef(
    "q72_cosine_pairs",
    (s, dir) => cosinePairs(s, dir).orderBy(col("a_id"), col("b_id")),
    Some(s"""WITH $normDuck
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS sim
      FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
      WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
      ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q73 — IVF-style ANN: coarse quantization by nearest-centroid cell
  // (centroids = every 97th vector, a deterministic stand-in for
  // k-means), queries probe their nprobe=2 nearest cells only. At scale
  // the cell assignment is one broadcast pass and the search touches
  // ~nprobe/k of the corpus — the classic inverted-file trade.
  private val q73 = QueryDef(
    "q73_ann_ivf",
    (s, dir) => {
      val vecs = withNorm(t(s, dir, "embeddings"))
      val cents = vecs.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm"))
      // cell assignment via the bounded top-2 aggregator, NOT a window:
      // row_number() over the n×|cells| assignment matrix would shuffle
      // and sort every (vector, centroid) pair; the aggregator combines
      // each partition down to 2 rows per vector first. embedding/nrm
      // are functionally dependent on vec_id, so first() is exact.
      val tk2 = graft.functions.TopK.topk(2)
      val assign = vecs.crossJoin(broadcast(cents))
        .withColumn("c_sim",
          expr(dotSpark("embedding", "c_emb")) / (col("nrm") * col("c_nrm")))
        .groupBy(col("vec_id"))
        .agg(tk2(col("c_sim"), col("c_id")).as("tk"),
          first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
      val cells = assign
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
          col("nrm").as("n_nrm"), col("tk").getItem(0).getField("id").as("cell"))
      val probes = assign.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), explode(expr("transform(tk, s -> s.id)")).as("cell"))
      val tk3 = graft.functions.TopK.topk(3)
      broadcast(probes).join(cells, Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim",
          expr(dotSpark("q_emb", "n_emb")) / (col("q_nrm") * col("n_nrm")))
        .groupBy(col("q_id")).agg(tk3(col("sim"), col("n_id")).as("tk"))
        .select(col("q_id"), posexplode(col("tk")).as(Seq("p", "s")))
        .select(col("q_id"), col("s.id").as("n_id"), col("s.score").as("sim"),
          (col("p") + 1).as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""WITH $normDuck,
      cents AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
        FROM vecs WHERE vec_id % 97 = 0),
      assign AS (SELECT v.vec_id, v.embedding, v.nrm, c.c_id,
          row_number() OVER (PARTITION BY v.vec_id ORDER BY
            ${dotDuck("v.embedding", "c.c_emb")} / (v.nrm * c.c_nrm) DESC, c.c_id) AS c_rk
        FROM vecs v CROSS JOIN cents c),
      cells AS (SELECT vec_id AS n_id, embedding AS n_emb, nrm AS n_nrm, c_id AS cell
        FROM assign WHERE c_rk = 1),
      probes AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id AS cell
        FROM assign WHERE vec_id % 100 = 0 AND c_rk <= 2),
      sims AS (SELECT q_id, n_id,
          ${dotDuck("q_emb", "n_emb")} / (q_nrm * n_nrm) AS sim
        FROM probes JOIN cells USING (cell) WHERE q_id <> n_id)
      SELECT q_id, n_id, sim, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        FROM sims) x
      WHERE rank <= 3 ORDER BY q_id, rank"""))

  // --------------------------------------------------------------------
  // q91 — embedding near-dup CLUSTERS: connected components over the
  // cosine pair graph (the embedding-space analog of q66's text
  // clustering; same size-switched [[graft.operators.Operators
  // .connectedComponents]]). Canonical id = min vec_id per component —
  // the representative an embedding-dedup pipeline keeps.
  private val q91 = QueryDef(
    "q91_embedding_dedup_clusters",
    (s, dir) =>
      graft.operators.Operators.connectedComponents(
        cosinePairs(s, dir).select(col("a_id"), col("b_id")),
        "a_id", "b_id", maxIter = 50)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy(col("vec_id")),
    Some(s"""WITH RECURSIVE $cosPairsDuck,
      edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      SELECT src AS vec_id, least(src, min(dst)) AS cluster
      FROM reach GROUP BY src ORDER BY vec_id"""))

  // --------------------------------------------------------------------
  // q95 — the SAME exact pair set as q72, produced by the scale path:
  // [[graft.operators.SimilarityOps.exactCosinePairsPruned]] — k-means
  // cells + triangle-inequality admissible cell pairs + exact verify on
  // the original vectors. The oracle is the identical brute-force SQL,
  // so the driver gate proves pruned ≡ brute end-to-end. No corpus
  // broadcast, no nested loop: assignments shuffle keyed on the cell
  // and only the k²-row admissible-pair table broadcasts.
  private val q95 = QueryDef(
    "q95_cosine_pairs_pruned",
    (s, dir) =>
      // 8 cells / 2 Lloyd iterations: exactness is cell-count-invariant
      // (PrunedCosineSpec proves equivalence across k); cells only tune
      // pruning granularity, and each extra cell/iteration is one more
      // sequential driver action in the farthest-point init — measured
      // 5.5s → 2.4s at sf0.1 going 16/3 → 8/2. At cluster scale a
      // larger k amortizes; the knob is explicit here.
      graft.operators.SimilarityOps.exactCosinePairsPruned(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, k = 8, iters = 2)
        .orderBy(col("a_id"), col("b_id")),
    Some(s"""WITH $normDuck
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS sim
      FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
      WHERE ${dotDuck("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
      ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------------
  // q97 — the SAME exact top-5 result as q70, produced by the scale
  // path: [[graft.operators.SimilarityOps.exactKnnPruned]] — each query
  // seeds a kth-sim bound from its own k-means cell, then visits only
  // cells whose ⟨q̂,c⟩+r bound can beat it, with exact sims from the
  // original vectors. Same oracle SQL as q70, so the driver gate proves
  // pruned ≡ brute. The corpus never broadcasts (q70 broadcasts the
  // query side — fine for sparse queries; this shape survives when
  // queries × corpus both outgrow a broadcast).
  private val q97 = QueryDef(
    "q97_knn_pruned",
    (s, dir) => {
      val vecs = t(s, dir, "embeddings")
      // 8/2 for the same init-cost reason as q95 (measured 11.6s →
      // 2.9s at sf0.1); exact for any cell count (PrunedKnnSpec)
      graft.operators.SimilarityOps.exactKnnPruned(
        vecs, vecs.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nCells = 8, iters = 2)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(knnOracle))

  // --------------------------------------------------------------------
  // q67 — the SAME exact top-5 result as q70, produced by the PQ tier:
  // [[graft.operators.SimilarityOps.exactKnnPq]] — ADC over 4-int codes
  // seeds a true-kth-distance bound, the per-point quantization
  // residual turns ADC into a triangle-inequality admission bound, and
  // the admitted set is exact-verified on the ORIGINAL vectors. Same
  // oracle SQL as q70, so the driver's hash gate proves the whole PQ
  // arithmetic chain (fit → encode → LUT → ADC fold) end to end, for
  // ANY codebook — the q95/q97 trick applied to the quantized tier.
  // The APPROXIMATE tiers (pqTopK / ivfPqTopK — the former q98/q99,
  // retired from the driver surface because approximate ANN has no SQL
  // oracle) share every one of those primitives and additionally have
  // PqSpec's recall, determinism, and nprobe=all ≡ full-scan proofs.
  private val q67 = QueryDef(
    "q67_knn_pq_exact",
    (s, dir) => {
      val vecs = t(s, dir, "embeddings")
      // iters=1: codebook quality tunes only the admitted-set SIZE
      // (verify work), never correctness — same knob economics as
      // q95/q97's 8/2 cells
      val model = graft.operators.SimilarityOps.pqFit(
        vecs, "vec_id", "embedding", m = 4, ksub = 16, iters = 1)
      graft.operators.SimilarityOps.exactKnnPq(
        vecs, vecs.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", model, k = 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(knnOracle))

  val defs: Seq[QueryDef] = Seq(q67, q70, q71, q72, q73, q91, q95, q97)
}
