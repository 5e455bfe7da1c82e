package graft.operators

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental near-dup detection against persisted LSH state — the
  * production shape at 100 TB: the corpus is banded ONCE, each arriving
  * batch joins its own bands against the stored index, and state grows
  * by appends. Equivalence oracle: a full recompute over the union,
  * restricted to pairs touching the batch, must yield the same pairs.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  private def codeSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr("shingle_code_set(text)").as("cs"))

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // near-dup corpus: b is a near-copy of a; d of c; e unique
  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "the quick brown fox jumps over the lazy cat again and again",
    3L -> "spark shuffles keyed data across the cluster in stages",
    4L -> "completely unrelated text about cooking pasta with garlic and oil")
  // batch: 5 near-dups corpus doc 1; 6 and 7 near-dup each other; 8 unique
  private val batch = docs(
    5L -> "the quick brown fox jumps over the lazy dog again and again today",
    6L -> "gradient descent updates parameters along the negative slope",
    7L -> "gradient descent updates parameters along the negative gradient slope",
    8L -> "nothing here resembles anything else in the corpus at all")

  private val tau = 0.5

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").as[(Long, Long)].collect().toSet

  test("batch vs stored index equals full recompute restricted to batch") {
    val corpusSets = codeSets(corpus).localCheckpoint()
    val corpusBands = Operators.minHashBands(corpusSets, "doc_id", "cs")
    val batchSets = codeSets(batch).localCheckpoint()
    val batchBands = Operators.minHashBands(batchSets, "doc_id", "cs")

    val inc = Operators.incrementalMinHashPairs(
      batchSets, batchBands, corpusSets, corpusBands, "doc_id", "cs", tau)

    // oracle: a from-scratch recompute over the whole union (the same
    // machinery fed an EMPTY index — every pair computed fresh),
    // restricted to pairs touching the batch
    val unionSets = codeSets(corpus.unionByName(batch)).localCheckpoint()
    val unionBands = Operators.minHashBands(unionSets, "doc_id", "cs")
    val full = Operators.incrementalMinHashPairs(
      unionSets, unionBands, unionSets.limit(0), unionBands.limit(0),
      "doc_id", "cs", tau)
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val expected = pairsOf(full).filter { case (a, b) =>
      batchIds.contains(a) || batchIds.contains(b)
    }
    assert(pairsOf(inc) === expected)
    // and the semantics are the intended ones on this corpus
    assert(pairsOf(inc).contains((1L, 5L)))
    assert(pairsOf(inc).contains((6L, 7L)))
  }

  test("GraftTable-backed state: two batches, index grows by appends") {
    val bandSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("band", IntegerType), StructField("v", LongType)))
    val setSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("cs", ArrayType(LongType))))
    val bandsT = GraftTable.create(spark, tmpDir("inc_bands"), bandSchema, Nil)
    val setsT = GraftTable.create(spark, tmpDir("inc_sets"), setSchema, Nil)

    def step(b: DataFrame): Set[(Long, Long)] = {
      val bSets = codeSets(b).localCheckpoint()
      val bBands = Operators.minHashBands(bSets, "doc_id", "cs")
        .localCheckpoint()
      val found = pairsOf(Operators.incrementalMinHashPairs(
        bSets, bBands, setsT.read(), bandsT.read(), "doc_id", "cs", tau))
      bandsT.insert(bBands)
      setsT.insert(bSets)
      found
    }

    val r1 = step(corpus) // empty state: only in-batch pairs
    assert(r1 === Set((1L, 2L)))
    val r2 = step(batch)
    assert(r2.contains((1L, 5L)) && r2.contains((6L, 7L)))
    // state grew: both tables hold corpus + batch rows
    assert(setsT.read().count() === 8)
    assert(bandsT.read().select("doc_id").distinct().count() === 8)
    // replaying the same batch against the grown index finds its own
    // stored twin — the caller's dedup-by-id guard, not silent loss
    val r3 = pairsOf(Operators.incrementalMinHashPairs(
      codeSets(batch), Operators.minHashBands(codeSets(batch), "doc_id", "cs"),
      setsT.read(), bandsT.read(), "doc_id", "cs", tau))
    assert(r3.contains((1L, 5L)))
  }
}
