package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.functions.GraftFunctions.register(spark)
  }

  // three well-separated 4-d clusters, deterministic jitter
  private val centers = Seq(
    Array(10.0, 0.0, 0.0, 0.0),
    Array(0.0, 10.0, 0.0, 0.0),
    Array(0.0, 0.0, 10.0, 0.0))
  private def corpus = (0 until 300).map { i =>
    val c = centers(i / 100)
    val jit = Array.tabulate(4)(d => ((i * 31 + d * 7) % 10) / 50.0 - 0.1)
    (i.toLong, c.zip(jit).map { case (x, j) => (x + j).toFloat }.toSeq)
  }.toDF("id", "vec")

  test("kmeansFit recovers well-separated cluster centers") {
    // init = 3 lowest ids — all from cluster 0, so convergence requires
    // the Lloyd iterations to actually move centroids apart
    val cents = SimilarityOps.kmeansFit(corpus, "id", "vec", k = 3, iters = 8)
    assert(cents.length === 3)
    // every true center is within jitter distance of some fitted centroid
    centers.foreach { c =>
      val best = cents.map(f =>
        math.sqrt(f.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(best < 0.5, s"center ${c.toSeq} unrecovered: ${cents.map(_.toSeq)}")
    }
  }

  test("hash init: one-action seeding, still recovers separated centers") {
    val cents = SimilarityOps.kmeansFit(corpus, "id", "vec", k = 3, iters = 8,
      init = "hash")
    assert(cents.length === 3)
    centers.foreach { c =>
      val best = cents.map(f =>
        math.sqrt(f.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(best < 0.5, s"center ${c.toSeq} unrecovered: ${cents.map(_.toSeq)}")
    }
    // deterministic: same call, same centroids
    val again = SimilarityOps.kmeansFit(corpus, "id", "vec", 3, 8, "hash")
    assert(cents.map(_.toSeq) === again.map(_.toSeq))
  }

  test("kmeansAssign is pure on the trained centroids and deterministic") {
    val cents = SimilarityOps.kmeansFit(corpus, "id", "vec", 3, 8)
    val assigned = SimilarityOps.kmeansAssign(corpus, "vec", cents)
      .select(col("id"), col("cell")).as[(Long, Int)].collect().sortBy(_._1)
    // purity: each true cluster maps onto exactly one cell
    val byCluster = assigned.groupBy(_._1 / 100)
      .map { case (g, rows) => g -> rows.map(_._2).distinct }
    byCluster.values.foreach(cells => assert(cells.length === 1))
    assert(byCluster.values.flatten.toSeq.distinct.length === 3)
    // repartitioning does not change assignments
    val again = SimilarityOps.kmeansAssign(corpus.repartition(13), "vec", cents)
      .select(col("id"), col("cell")).as[(Long, Int)].collect().sortBy(_._1)
    assert(again === assigned)
  }

  test("nearestCell breaks distance ties to the lowest centroid index") {
    val df = Seq((1L, Seq(0.0f, 0.0f))).toDF("id", "vec")
    val cents = Seq(Array(1.0, 0.0), Array(-1.0, 0.0)) // equidistant
    val cell = SimilarityOps.kmeansAssign(df, "vec", cents)
      .select("cell").as[Int].head()
    assert(cell === 0)
  }
}
