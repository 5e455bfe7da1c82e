package graft.operators

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental decontamination state — the sketch twin of the MinHash
  * band index: eval-set batches arrive over time, each batch's sketch
  * OR-merges into the persisted union sketch, and corpus batches probe
  * the running union. [[Operators.bloomMerge]] must be EXACT state
  * maintenance (bit-identical to a from-scratch build over the union,
  * not an approximation), and the persisted round-trip must preserve
  * probe behavior. */
class IncrementalBloomSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  private val cap = 10000L // capacity plan shared by every batch
  private def keysDf(ks: Seq[String]): DataFrame = ks.toDF("g")

  private val batch1 = (0 until 200).map(i => s"eval_a_$i")
  private val batch2 = (0 until 150).map(i => s"eval_b_$i")
  private val corpus = ((0 until 500).map(i => s"train_$i") ++
    batch1.take(30) ++ batch2.take(20)).zipWithIndex
    .map { case (g, i) => (i.toLong, g) }

  test("merged per-batch sketches are bit-identical to the union build") {
    val s1 = Operators.bloomSketch(keysDf(batch1), "g", cap)
    val s2 = Operators.bloomSketch(keysDf(batch2), "g", cap)
    val merged = Operators.bloomMerge(s1, s2)
    val full = Operators.bloomSketch(keysDf(batch1 ++ batch2), "g", cap)
    assert(merged.toSeq === full.toSeq, "OR-merge diverged from full build")
  }

  test("empty batch is the identity of the merge") {
    val s1 = Operators.bloomSketch(keysDf(batch1), "g", cap)
    val empty = Operators.bloomSketch(keysDf(Nil), "g", cap)
    assert(Operators.bloomMerge(s1, empty).toSeq === s1.toSeq)
  }

  test("parameter drift is refused, not silently mis-merged") {
    val s1 = Operators.bloomSketch(keysDf(batch1), "g", cap)
    val other = Operators.bloomSketch(keysDf(batch2), "g", cap * 500)
    intercept[Exception](Operators.bloomMerge(s1, other))
  }

  test("GraftTable-persisted sketch: batches merge in, probes stay exact") {
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("sketch", BinaryType)))
    val t = GraftTable.create(spark, tmpDir("inc_bloom"), schema, Seq("id"))

    def mergeIn(batch: Seq[String]): Unit = {
      val s = Operators.bloomSketch(keysDf(batch), "g", cap)
      val prev = t.read().collect().headOption
        .map(_.getAs[Array[Byte]]("sketch"))
      val next = prev.fold(s)(Operators.bloomMerge(_, s))
      t.replaceRows(Seq((1, next)).toDF("id", "sketch")) // single-row upsert
    }

    mergeIn(batch1)
    mergeIn(batch2)
    val stored = t.read().collect().head.getAs[Array[Byte]]("sketch")
    val corpusDf = corpus.toDF("row_id", "g")
    val pre = Operators.bloomPrefilterWith(corpusDf, "g", stored)
      .select("row_id").as[Long].collect().toSet
    val truth = corpus.collect {
      case (i, g) if batch1.contains(g) || batch2.contains(g) => i
    }.toSet
    assert(truth.subsetOf(pre), "persisted sketch dropped a true hit")
    // exact decontamination = prefilter + exact verify, as semiJoinBloom
    val evalDf = (batch1 ++ batch2).toDF("g")
    val got = pre.intersect(
      corpusDf.join(evalDf, Seq("g"), "left_semi")
        .select("row_id").as[Long].collect().toSet)
    assert(got === truth)
  }
}
