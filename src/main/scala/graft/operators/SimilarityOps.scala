package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators beyond the query pack: k-means training
  * for IVF cells (q73 uses deterministic stand-in centroids; this is
  * the real trainer a production index builds with).
  *
  * Everything is expression-based — the per-row argmin over centroids
  * compiles to k codegen'd [[graft.functions.VecDot]] calls plus an
  * array_min over (distance, index) structs, so assignment stays inside
  * whole-stage codegen with no UDF and no shuffle. Requires
  * [[graft.functions.GraftFunctions.register]].
  */
object SimilarityOps {

  /** Column: index (0-based) of the nearest centroid by squared L2 —
    * ‖v−c‖² = ‖v‖² − 2·v·c + ‖c‖², and ‖v‖² is constant per row, so
    * argmin needs only −2·v·c + ‖c‖². Ties break to the lowest index
    * (struct ordering), keeping assignment deterministic. */
  def nearestCell(vec: Column, centroids: Seq[Array[Double]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val structs = centroids.zipWithIndex.map { case (c, i) =>
      val cNorm = c.map(x => x * x).sum
      struct(
        (lit(-2.0) * call_function("vec_dot", vec, typedlit(c.toSeq)) + lit(cNorm))
          .as("d"),
        lit(i).as("i"))
    }
    array_min(array(structs: _*)).getField("i")
  }

  /** Assign every row its nearest-centroid cell id. */
  def kmeansAssign(df: DataFrame, vecCol: String,
      centroids: Seq[Array[Double]], cellCol: String = "cell"): DataFrame =
    df.withColumn(cellCol, nearestCell(col(vecCol), centroids))

  /** Squared distance to the NEAREST of `centroids` (true value, not
    * the per-row-shifted argmin form — comparable ACROSS rows, which
    * farthest-point init needs). */
  private def minSqDist(vec: Column, centroids: Seq[Array[Double]]): Column =
    call_function("vec_dot", vec, vec) +
      array_min(array(centroids.map { c =>
        lit(-2.0) * call_function("vec_dot", vec, typedlit(c.toSeq)) +
          lit(c.map(x => x * x).sum)
      }: _*))

  /** Lloyd's k-means over `vecCol` (Array[Float/Double]).
    * Deterministic end to end: farthest-point init (first = lowest
    * `idCol`, each next = the point farthest from the chosen set, ties
    * to the lowest id — naive lowest-k init collapses when all seeds
    * land in one true cluster), assignment ties break to the lowest
    * centroid index, and the centroid update averages with an
    * order-free mean per dimension. Each iteration is one assignment
    * pass (codegen, no shuffle) plus one k×dim-sized aggregation — the
    * update shuffle carries (cell, dim) partial sums only, never
    * vectors. Empty cells keep their previous centroid. */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Seq[Array[Double]] = {
    require(k > 0 && iters >= 0, "k > 0, iters >= 0")
    val vecs = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
      .localCheckpoint() // scanned k+iters times
    var cents: Seq[Array[Double]] = Seq(
      vecs.orderBy(col("__id")).limit(1)
        .select(col("__v")).head().getSeq[Double](0).toArray)
    while (cents.size < k) {
      cents = cents :+ vecs
        .withColumn("__d", minSqDist(col("__v"), cents))
        .orderBy(col("__d").desc, col("__id")).limit(1)
        .select(col("__v")).head().getSeq[Double](0).toArray
    }
    var it = 0
    while (it < iters) {
      val updated = vecs
        .withColumn("__cell", nearestCell(col("__v"), cents))
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy(col("__cell"), col("__dim"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      val byCell = updated.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byCell.get(ci) match {
          case Some(rows) =>
            val dim = old.length
            val next = new Array[Double](dim)
            rows.foreach { r =>
              next(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
            }
            next
          case None => old // empty cell: keep previous centroid
        }
      }
      it += 1
    }
    cents
  }
}
