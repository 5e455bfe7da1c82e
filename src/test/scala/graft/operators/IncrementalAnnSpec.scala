package graft.operators

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental embedding near-dup detection against a persisted IVF
  * index ([[SimilarityOps.incrementalCosinePairs]]) — the
  * continuous-ingest twin of IncrementalDedupSpec: the corpus is
  * cell-assigned once, each arriving batch probes the stored cells,
  * state grows by appends. Equivalence oracle: exact brute-force
  * cosine pairs over the union, restricted to pairs touching the
  * batch (the fixture's clusters are well separated, so IVF recall is
  * total and the comparison is exact).
  */
class IncrementalAnnSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  // three well-separated directions in 4-d; members jitter within a
  // cluster (cosine ≈ 0.999 inside, ≈ 0 across)
  private def vec(base: Int, jitter: Double): Array[Double] = {
    val v = Array.fill(4)(0.0)
    v(base) = 10.0
    v((base + 1) % 4) += jitter
    v
  }

  private val corpus = Seq(
    (1L, vec(0, 0.1)), (2L, vec(0, 0.2)), // near-dups of each other
    (3L, vec(1, 0.1)),
    (4L, vec(2, 0.15))
  ).toDF("vec_id", "embedding")
  private val batchA = Seq(
    (5L, vec(0, 0.12)), // near-dups corpus 1 and 2
    (6L, vec(1, 0.05)), // near-dups corpus 3
    (7L, vec(2, 3.0))   // same cell as 4 but angled away: no pair
  ).toDF("vec_id", "embedding")
  private val batchB = Seq(
    (8L, vec(1, 0.07)) // near-dups 3 and 6
  ).toDF("vec_id", "embedding")

  private val threshold = 0.99

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").as[(Long, Long)].collect().toSet

  /** Exact oracle: brute-force cosine over collected vectors. */
  private def brute(dfs: DataFrame*): Set[(Long, Long)] = {
    val vs = dfs.flatMap(_.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    (for {
      (ia, va) <- vs; (ib, vb) <- vs
      if ia < ib && cos(va, vb) >= threshold
    } yield (ia, ib)).toSet
  }

  test("batch vs stored index equals brute force restricted to the batch") {
    val cents = SimilarityOps.kmeansFit(corpus, "vec_id", "embedding", 3, 5)
    val index = SimilarityOps.ivfIndexRows(
      corpus, "vec_id", "embedding", "cell", cents)
    val inc = pairsOf(SimilarityOps.incrementalCosinePairs(
      batchA, index, "vec_id", "embedding", "cell", cents,
      nprobe = 2, threshold))
    val batchIds = Set(5L, 6L, 7L)
    val expected = brute(corpus, batchA).filter { case (a, b) =>
      batchIds.contains(a) || batchIds.contains(b)
    }
    assert(inc === expected)
    assert(inc.contains((1L, 5L)) && inc.contains((2L, 5L)) &&
      inc.contains((3L, 6L)))
    assert(!inc.exists { case (a, b) => a == 7L || b == 7L })
  }

  test("GraftTable-backed state: index grows by appends across batches") {
    val cents = SimilarityOps.kmeansFit(corpus, "vec_id", "embedding", 3, 5)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cell", IntegerType),
      StructField("embedding", ArrayType(DoubleType))))
    val indexT = GraftTable.create(spark, tmpDir("inc_ivf"), schema, Nil)

    def step(b: DataFrame): Set[(Long, Long)] = {
      val found = pairsOf(SimilarityOps.incrementalCosinePairs(
        b, indexT.read(), "vec_id", "embedding", "cell", cents,
        nprobe = 2, threshold))
      indexT.insert(SimilarityOps.ivfIndexRows(
        b, "vec_id", "embedding", "cell", cents))
      found
    }

    val r0 = step(corpus) // empty index: in-batch pairs only
    assert(r0 === Set((1L, 2L)))
    val r1 = step(batchA)
    assert(r1 === Set((1L, 5L), (2L, 5L), (3L, 6L)))
    val r2 = step(batchB) // sees BOTH earlier generations
    assert(r2 === Set((3L, 8L), (6L, 8L)))
    assert(indexT.read().count() === 8L)
  }
}
