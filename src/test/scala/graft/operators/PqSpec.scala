package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization ([[SimilarityOps.pqFit/pqEncode/pqTopK]]) —
  * approximate by DESIGN, so the contract is: deterministic codes of
  * the declared shape, exact LUT arithmetic (a candidate's approx
  * distance equals the decoded-centroid distance computed by hand),
  * and measured recall vs the brute cosine ranking on clustered data. */
class PqSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  // 4 clusters in 8-d + mild jitter — the regime PQ is built for
  private val corpus: DataFrame = {
    val rows = (0L until 200L).map { i =>
      val r = lcg(i * 104729 + 7).take(8).toArray
      val base = Array.fill(8)(0.0); base((i % 4).toInt * 2) = 5.0
      (i, base.zip(r).map { case (b, x) => b + x * 0.6 })
    }
    rows.toDF("vec_id", "embedding")
  }
  private val queries = corpus.filter(col("vec_id") % 20 === 0)

  private lazy val model = SimilarityOps.pqFit(corpus, "vec_id", "embedding",
    m = 4, ksub = 8, iters = 3)
  private lazy val codes = SimilarityOps.pqEncode(corpus, "vec_id",
    "embedding", model).localCheckpoint()

  test("codes have the declared shape and are deterministic") {
    assert(model.m === 4 && model.dsub === 2 && model.books.forall(_.size == 8))
    val c1 = codes.as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(c1.forall(_._2.size == 4))
    assert(c1.forall(_._2.forall(c => c >= 0 && c < 8)))
    val c2 = SimilarityOps.pqEncode(corpus, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(c1 === c2)
  }

  test("approx distance equals the hand-computed decoded distance") {
    val out = SimilarityOps.pqTopK(codes, queries, "vec_id", "embedding",
        model, k = 3)
      .as[(Long, Long, Double, Int)].collect()
    val vecs = corpus.as[(Long, Array[Double])].collect().toMap
    val codeMap = codes.as[(Long, Seq[Int])].collect().toMap
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    out.foreach { case (qid, nid, d, _) =>
      val qu = unit(vecs(qid))
      val want = (0 until model.m).map { j =>
        val sub = qu.slice(j * model.dsub, (j + 1) * model.dsub)
        val cent = model.books(j)(codeMap(nid)(j))
        sub.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      assert(math.abs(d - want) < 1e-9, s"q=$qid n=$nid: $d vs $want")
    }
  }

  test("recall@5 vs brute cosine on clustered data") {
    val got = SimilarityOps.pqTopK(codes, queries, "vec_id", "embedding",
        model, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vecs = corpus.as[(Long, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val brute = vecs.filter(_._1 % 20 == 0).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(5).map(_._1).toSet
    }.toMap
    val recalls = brute.map { case (qid, want) =>
      got.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 $mean below floor")
  }

  test("IVF-PQ with nprobe = all cells is IDENTICAL to the full PQ scan") {
    val cents = SimilarityOps.kmeansFit(
      SimilarityOps.unitNormalized(corpus, "vec_id", "embedding"),
      "vec_id", "embedding", k = 6, iters = 3, init = "hash")
    val index = SimilarityOps.pqIndex(corpus, "vec_id", "embedding",
      model, cents).localCheckpoint()
    val full = SimilarityOps.pqTopK(codes, queries, "vec_id", "embedding",
        model, k = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val ivf = SimilarityOps.ivfPqTopK(index, queries, "vec_id", "embedding",
        "cell", model, cents, nprobe = 6, k = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(ivf === full, "probing every cell must reproduce the full scan")
  }

  test("IVF-PQ keyed probe: good recall at nprobe 2, keyed join shape") {
    val cents = SimilarityOps.kmeansFit(
      SimilarityOps.unitNormalized(corpus, "vec_id", "embedding"),
      "vec_id", "embedding", k = 6, iters = 3, init = "hash")
    val index = SimilarityOps.pqIndex(corpus, "vec_id", "embedding",
      model, cents).localCheckpoint()
    val out = SimilarityOps.ivfPqTopK(index, queries, "vec_id", "embedding",
      "cell", model, cents, nprobe = 2, k = 5)
    val got = out.as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // recall vs the FULL PQ scan (isolates cell pruning from coding loss)
    val full = SimilarityOps.pqTopK(codes, queries, "vec_id", "embedding",
        model, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = full.map { case (qid, want) =>
      got.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
    }
    assert(recalls.sum / recalls.size >= 0.6,
      s"nprobe=2 recall ${recalls.sum / recalls.size} below floor")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("incremental index: per-batch encode rows equal the union build") {
    // under a FIXED model + cells, pqIndex is a deterministic per-row
    // narrow map — so appending each batch's rows IS the union index,
    // and a persisted code table grows by appends exactly like the
    // MinHash band index and the bloom sketch
    val cents = SimilarityOps.kmeansFit(
      SimilarityOps.unitNormalized(corpus, "vec_id", "embedding"),
      "vec_id", "embedding", k = 6, iters = 3, init = "hash")
    val (a, b) = (corpus.filter(col("vec_id") < 100),
      corpus.filter(col("vec_id") >= 100))
    val incremental = SimilarityOps.pqIndex(a, "vec_id", "embedding", model, cents)
      .unionByName(SimilarityOps.pqIndex(b, "vec_id", "embedding", model, cents))
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1)
    val full = SimilarityOps.pqIndex(corpus, "vec_id", "embedding", model, cents)
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1)
    assert(incremental === full)
  }

  test("residual encode: resid equals the hand-computed decode distance") {
    val withR = SimilarityOps.pqEncodeResidual(corpus, "vec_id", "embedding",
      model).as[(Long, Seq[Int], Double)].collect()
    val vecs = corpus.as[(Long, Array[Double])].collect().toMap
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val codeMap = codes.as[(Long, Seq[Int])].collect().toMap
    withR.foreach { case (id, code, resid) =>
      assert(code === codeMap(id)) // same codes as pqEncode
      val u = unit(vecs(id))
      val want = math.sqrt((0 until model.m).map { j =>
        val sub = u.slice(j * model.dsub, (j + 1) * model.dsub)
        val cent = model.books(j)(code(j))
        sub.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum)
      assert(math.abs(resid - want) < 1e-9, s"id=$id: $resid vs $want")
    }
  }

  test("exactKnnPq EQUALS the brute exact top-k (ids, sims, ranks)") {
    // the driver-facing exactness mode (q67): ADC + residual bound
    // admission + exact verify must be bit-identical to the brute scan
    // for this arbitrary (deliberately weak: iters could be 0) codebook
    val got = SimilarityOps.exactKnnPq(corpus, queries, "vec_id",
        "embedding", model, k = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val vecs = corpus.as[(Long, Array[Double])].collect()
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val brute = vecs.filter(_._1 % 20 == 0).flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(5).zipWithIndex
        .map { case ((nid, s), i) => (qid, nid, i + 1) }
    }.sortBy(r => (r._1, r._3))
    assert(got.map(r => (r._1, r._2, r._4)) === brute)
    // sims are the exact cosines, not ADC approximations
    val bySim = vecs.toMap
    got.foreach { case (qid, nid, sim, _) =>
      assert(math.abs(sim - cos(bySim(qid), bySim(nid))) < 1e-12)
    }
  }

  test("exactKnnPq ≡ brute on randomized corpora (duplicates, zero vectors, varied knobs)") {
    // the hash gate (q67) rests on exactness for ANY codebook — so the
    // property is pinned across corpora with exact-tie duplicates, a
    // zero vector on each side, and varying k/ksub/iters
    (0 until 5).foreach { trial =>
      val n = 60 + trial * 17
      val dim = 8
      val raw = (0L until n.toLong).map { i =>
        val r = lcg(i * 7919 + trial * 131 + 3).take(dim).toArray
        val base = Array.fill(dim)(0.0); base((i % 3).toInt * 2) = 3.0
        (i, base.zip(r).map { case (b, x) => b + x })
      }.toArray
      // every 11th vector duplicates its predecessor (exact sim ties);
      // id 10 is the zero vector — a query id too, so BOTH sides of
      // the zero-norm exclusion are exercised
      val rows = raw.map { case (i, v) =>
        if (i == 10) (i, Array.fill(dim)(0.0))
        else if (i % 11 == 0 && i > 0) (i, raw((i - 1).toInt)._2)
        else (i, v)
      }
      val corpus = rows.toSeq.toDF("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") % 10 === 0)
      val k = 3 + trial % 3
      val m2 = SimilarityOps.pqFit(corpus, "vec_id", "embedding",
        m = 4, ksub = 4 + trial % 5, iters = trial % 3)
      val got = SimilarityOps.exactKnnPq(corpus, queries, "vec_id",
          "embedding", m2, k)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
      def cos(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => x * y }.sum /
          (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
      val live = rows.filter { case (_, v) => norm(v) > 0 }
      val brute = live.filter(_._1 % 10 == 0).flatMap { case (qid, qv) =>
        live.filter(_._1 != qid)
          .map { case (nid, nv) => (nid, cos(qv, nv)) }
          .sortBy { case (nid, s) => (-s, nid) }.take(k).zipWithIndex
          .map { case ((nid, _), i) => (qid, nid, i + 1) }
      }.sortBy(r => (r._1, r._3))
      assert(got.map(r => (r._1, r._2, r._4)).toSeq === brute.toSeq,
        s"trial $trial: ids/ranks diverged from brute")
      val byId = rows.toMap
      got.foreach { case (qid, nid, sim, _) =>
        assert(math.abs(sim - cos(byId(qid), byId(nid))) < 1e-12,
          s"trial $trial: sim for ($qid,$nid)")
      }
    }
  }

  test("a corpus smaller than ksub still trains a full-width usable model") {
    // books(j).length == ksub is part of the model contract — pqLut
    // indexes c < ksub — so a 6-row corpus under ksub=8 must pad seeds
    // (duplicate centroids are fine: argmin ties break low)
    val tiny = corpus.filter(col("vec_id") < 6)
    val m2 = SimilarityOps.pqFit(tiny, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 1)
    assert(m2.books.forall(_.size == 8))
    val out = SimilarityOps.exactKnnPq(tiny,
        tiny.filter(col("vec_id") === 0), "vec_id", "embedding", m2, k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length === 3) // ranks against the other 5 vectors
  }

  test("the scan never decodes the corpus and stays broadcast-shaped") {
    val plan = SimilarityOps.pqTopK(codes, queries, "vec_id", "embedding",
        model, k = 3)
      .queryExecution.executedPlan.toString
    // the corpus side carries only (n_id, code) — no embedding column
    assert(!plan.contains("n_emb"), plan.take(1200))
    assert(plan.contains("topk"), plan.take(1200))
  }
}
