package graft.operators

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Operators.incrementalGramPairs]] — incremental substring-overlap
  * state: batch-vs-index must equal a full recompute restricted to
  * pairs touching the batch, shared counts must be exact (no
  * double-counted batch↔batch codes), and the GraftTable loop must
  * grow by appends like the other incremental indexes. */
class IncrementalGramSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  /** distinct (doc_id, code) rows from word-bigram grams. */
  private def codes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(w) < 2 THEN array()
           ELSE transform(sequence(1, size(w) - 1),
             i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) END"""))
        .as("g"))
      .select(col("doc_id"), expr("poly_hash(g)").as("code")).distinct()

  private val corpus = Seq(
    1L -> "the quick brown fox jumps high",
    2L -> "the quick red fox sits still",
    3L -> "unrelated words entirely here now").toDF("doc_id", "text")
  private val batch = Seq(
    4L -> "the quick brown fox runs far", // shares grams with 1 and 2
    5L -> "gradient descent updates weights",
    6L -> "gradient descent updates parameters").toDF("doc_id", "text")

  private def pairs(df: DataFrame): Map[(Long, Long), Long] =
    df.as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap

  test("batch vs index equals full recompute restricted to the batch") {
    val inc = pairs(Operators.incrementalGramPairs(
      codes(batch), codes(corpus), "doc_id", "code"))
    // oracle: full recompute over the union (empty index), batch pairs
    val full = pairs(Operators.incrementalGramPairs(
      codes(corpus.unionByName(batch)),
      codes(corpus).limit(0), "doc_id", "code"))
    val batchIds = Set(4L, 5L, 6L)
    val expected = full.filter { case ((a, b), _) =>
      batchIds.contains(a) || batchIds.contains(b)
    }
    assert(inc === expected)
    // semantics on this corpus: doc 4 shares "the quick" + "quick
    // brown"/"brown fox" chains with 1 and "the quick" with 2;
    // batch-internal 5-6 share "gradient descent"+"descent updates"
    assert(inc(1L -> 4L) === 3L) // the quick, quick brown, brown fox
    assert(inc(2L -> 4L) === 1L) // the quick
    assert(inc(5L -> 6L) === 2L) // gradient descent, descent updates
    assert(!inc.contains(3L -> 4L))
  }

  test("minShared filters, GraftTable state grows by appends") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("code", LongType)))
    val t = GraftTable.create(spark, tmpDir("inc_gram"), schema, Nil)
    def step(b: DataFrame, minShared: Long): Map[(Long, Long), Long] = {
      val bc = codes(b).localCheckpoint()
      val found = pairs(Operators.incrementalGramPairs(
        bc, t.read(), "doc_id", "code", minShared))
      t.insert(bc)
      found
    }
    val r1 = step(corpus, 2L) // empty index: docs 1-2 share only ONE
    assert(r1 === Map.empty)  // bigram ("the quick") — filtered at 2
    val r2 = step(batch, 2L)
    assert(r2.contains(1L -> 4L) && r2.contains(5L -> 6L))
    assert(!r2.contains(2L -> 4L)) // only 1 shared gram, filtered
    assert(t.read().select("doc_id").distinct().count() === 6L)
  }
}
