package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Randomized equivalence properties for the round-7 exact operators.
  * The fixed-fixture specs pin the designed cases; these throw seeded
  * random corpora (varying dimensionality, cluster structure, duplicate
  * vectors, thresholds INCLUDING negatives and near-boundary values) at
  * the pruned/routed plans and require bit-exact agreement with the
  * brute-force formulation — the epsilon/admission logic has no
  * "approximately right": one dropped boundary pair is a correctness
  * bug the driver's hash gate would catch in production. */
class PrunedPropertySpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(977L + i)))

  // corpus generator: n vectors of dim d, a fraction aligned to a few
  // archetypes (forcing duplicates/near-duplicates and exact-boundary
  // cosines), the rest noise
  private case class Corpus(dim: Int, rows: Seq[(Long, Array[Double])])
  private val corpusGen: Gen[Corpus] = for {
    dim <- Gen.choose(2, 12)
    n <- Gen.choose(8, 60)
    nArch <- Gen.choose(1, 4)
    arch <- Gen.listOfN(nArch * dim, Gen.choose(-1.0, 1.0))
    noise <- Gen.listOfN(n * dim, Gen.choose(-1.0, 1.0))
    kinds <- Gen.listOfN(n, Gen.choose(0, nArch + 1))
  } yield {
    val archs = arch.grouped(dim).map(_.toArray).toArray
    val rows = (0 until n).map { i =>
      val base = noise.slice(i * dim, (i + 1) * dim).toArray
      val v = kinds(i) match {
        case k if k < nArch => archs(k).clone() // exact duplicate of an archetype
        case k if k == nArch && nArch > 0 =>
          archs(0).zip(base).map { case (a, x) => a + x * 0.05 } // near-dup
        case _ => base
      }
      (i.toLong, v)
    }.filter(_._2.exists(_ != 0.0))
    Corpus(dim, rows)
  }

  private def cos(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))

  test("exactCosinePairsPruned ≡ brute on random corpora and thresholds") {
    val gen = for {
      c <- corpusGen
      t <- Gen.oneOf(Gen.choose(-0.5, 0.99), Gen.oneOf(0.0, 0.5, 1.0))
      k <- Gen.choose(2, 6)
    } yield (c, t, k)
    samples(gen, 8).foreach { case (c, t, k) =>
      val df = c.rows.toDF("id", "v")
      val got = SimilarityOps.exactCosinePairsPruned(df, "id", "v", t, k, 2)
        .as[(Long, Long, Double)].collect().toSet
      val want = (for {
        (ia, va) <- c.rows; (ib, vb) <- c.rows if ia < ib
        s = cos(va, vb) if s >= t
      } yield (ia, ib, s)).toSet
      assert(got.map(p => (p._1, p._2)) === want.map(p => (p._1, p._2)),
        s"pair set diverged: dim=${c.dim} n=${c.rows.size} t=$t k=$k")
    }
  }

  test("exactKnnPruned ≡ brute on random corpora") {
    val gen = for {
      c <- corpusGen
      k <- Gen.choose(1, 5)
      cells <- Gen.choose(2, 6)
    } yield (c, k, cells)
    samples(gen, 6).foreach { case (c, k, cells) =>
      val df = c.rows.toDF("id", "v")
      val queries = df.filter(col("id") % 3 === 0)
      val got = SimilarityOps.exactKnnPruned(df, queries, "id", "v", k,
          nCells = cells, iters = 1)
        .orderBy(col("q_id"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSeq
      val want = c.rows.filter(_._1 % 3 == 0).flatMap { case (qid, qv) =>
        c.rows.filter(_._1 != qid)
          .map { case (nid, nv) => (nid, cos(qv, nv)) }
          .sortBy { case (nid, s) => (-s, nid) }
          .take(k).zipWithIndex
          .map { case ((nid, s), p) => (qid, nid, s, p + 1) }
      }
      assert(got === want, s"dim=${c.dim} n=${c.rows.size} k=$k cells=$cells")
    }
  }

  test("jaccardPairsAuto ≡ prefix path on random code-sets, both routes") {
    val setGen = for {
      vocab <- Gen.oneOf(12, 40, 5000) // hot → dense route, cold → prefix
      n <- Gen.choose(6, 40)
      lens <- Gen.listOfN(n, Gen.choose(1, 9))
      codes <- Gen.listOfN(lens.sum, Gen.choose(0L, vocab.toLong))
      tau <- Gen.oneOf(0.2, 0.5, 0.8)
    } yield {
      val it = codes.iterator
      val rows = lens.zipWithIndex.map { case (l, i) =>
        (i.toLong, Seq.fill(l)(it.next()).distinct.sorted)
      }
      (rows, tau)
    }
    samples(setGen, 8).foreach { case (rows, tau) =>
      val df = rows.toDF("id", "cs")
      def norm(d: org.apache.spark.sql.DataFrame) =
        d.select(col("a_id"), col("b_id"), col("inter"))
          .as[(Long, Long, Long)].collect().toSet
      val auto = norm(Operators.jaccardPairsAuto(df, "id", "cs", tau))
      val pref = norm(Operators.jaccardPairsPrefix(df, "id", "cs", tau))
      assert(auto === pref, s"n=${rows.size} tau=$tau")
    }
  }

  test("semiJoinBloom ≡ exact semi-join on random key sets") {
    val gen = for {
      nl <- Gen.choose(0, 300)
      nr <- Gen.choose(0, 60)
      lks <- Gen.listOfN(nl, Gen.choose(0, 400))
      rks <- Gen.listOfN(nr, Gen.choose(0, 400))
      fpp <- Gen.oneOf(0.5, 0.01, 1e-4)
    } yield (lks, rks, fpp)
    samples(gen, 8).foreach { case (lks, rks, fpp) =>
      val left = lks.zipWithIndex.map { case (k, i) => (i.toLong, s"k$k") }
        .toDF("row_id", "key")
      val right = rks.map(k => s"k$k").toDF("rkey")
      val got = Operators.semiJoinBloom(left, "key", right, "rkey", fpp)
        .select(col("row_id")).as[Long].collect().toSet
      val want = lks.zipWithIndex
        .collect { case (k, i) if rks.contains(k) => i.toLong }.toSet
      assert(got === want, s"nl=${lks.size} nr=${rks.size} fpp=$fpp")
    }
  }
}
