package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[SimilarityOps.exactKnnPruned]] — the two-phase metric-pruned KNN
  * must return EXACTLY the brute-force top-k (it is exact, not ANN):
  * equivalence across k and cell counts on clustered + noise corpora,
  * deterministic tie handling, self-exclusion semantics, and the plan
  * must keep the corpus out of any broadcast. */
class PrunedKnnSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  // 3 tight clusters + noise, 8-d (the PrunedCosineSpec corpus shape)
  private val corpus: DataFrame = {
    val rows = (0L until 150L).map { i =>
      val r = lcg(i * 7919 + 13).take(8).toArray
      val v =
        if (i % 4 == 3) r.map(_ * 2.0)
        else {
          val base = Array.fill(8)(0.0); base((i % 4).toInt * 2) = 5.0
          base.zip(r).map { case (b, x) => b + x * 0.4 }
        }
      (i, v)
    }
    rows.toDF("vec_id", "embedding")
  }
  private val queries = corpus.filter(col("vec_id") % 10 === 0)

  private def brute(k: Int): Seq[(Long, Long, Double, Int)] = {
    val vs = corpus.as[(Long, Array[Double])].collect()
    val qs = vs.filter(_._1 % 10 == 0)
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    qs.flatMap { case (qid, qv) =>
      vs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, s), p) => (qid, nid, s, p + 1) }
    }.toSeq
  }

  private def pruned(k: Int, nCells: Int): Seq[(Long, Long, Double, Int)] =
    SimilarityOps.exactKnnPruned(corpus, queries, "vec_id", "embedding",
      k, nCells = nCells, iters = 2)
      .orderBy(col("q_id"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq

  test("equals brute-force top-k across k and cell counts") {
    for (k <- Seq(1, 5); c <- Seq(4, 12, 0)) { // 0 = auto-√n
      assert(pruned(k, c) === brute(k), s"k=$k cells=$c")
    }
  }

  test("k larger than the corpus returns everything, ranked") {
    val got = pruned(500, 4)
    assert(got === brute(500))
    // every query sees all 149 non-self rows
    assert(got.groupBy(_._1).forall(_._2.size == 149))
  }

  test("duplicate vectors tie-break by id, exactly as brute") {
    val dup = corpus.union(Seq(
      (900L, Array.fill(8)(0.0).updated(0, 5.0)),
      (901L, Array.fill(8)(0.0).updated(0, 5.0))).toDF("vec_id", "embedding"))
    val q = dup.filter(col("vec_id") >= 900L)
    val got = SimilarityOps.exactKnnPruned(dup, q, "vec_id", "embedding",
        3, nCells = 4, iters = 2)
      .orderBy(col("q_id"), col("rank"))
      .as[(Long, Long, Double, Int)].collect()
    // each duplicate's nearest neighbor is the OTHER duplicate (sim 1)
    assert(got.filter(_._1 == 900L).head._2 === 901L)
    assert(got.filter(_._1 == 901L).head._2 === 900L)
    assert(got.forall(r => r._1 != r._2), "self not excluded")
  }

  test("plan: corpus side never broadcasts; probe joins stay keyed") {
    val plan = SimilarityOps.exactKnnPruned(corpus, queries, "vec_id",
        "embedding", 5, nCells = 4, iters = 1)
      .queryExecution.executedPlan.toString
    // the only nested-loop is the bounds join against the nCells-row
    // centroid table — count how many rows its broadcast carries by
    // asserting the corpus-member joins are hash/sort-merge
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }
}
