package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Operators.bloomPrefilter]] / [[Operators.semiJoinBloom]] — the
  * runtime-filter pattern as a whole operator: the prefilter must never
  * drop a true match (no false negatives), the composed semi-join must
  * equal the exact semi-join bit-for-bit, and the prefilter must
  * actually prune (the point of the sketch). */
class BloomSemiJoinSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  // 10k left keys, 300 right keys, 150 overlapping — plus nulls and
  // duplicates on both sides to pin the SQL semi-join semantics
  private lazy val left = ((0L until 10000L).map(i => (i, s"k$i")) ++
    Seq((20000L, null.asInstanceOf[String]), (20001L, "k7"), (20002L, "k7")))
    .toDF("row_id", "key")
  private lazy val right = ((0L until 150L).map(i => s"k$i") ++
    (50000L until 50150L).map(i => s"k$i") ++
    Seq(null.asInstanceOf[String], "k3", "k3")).toDF("rkey")

  private lazy val exact =
    left.join(right.select(col("rkey").as("key")).na.drop(), Seq("key"),
      "left_semi").select(col("row_id")).as[Long].collect().toSet

  test("semiJoinBloom equals the exact semi-join (nulls, dupes, misses)") {
    val got = Operators.semiJoinBloom(left, "key", right, "rkey")
      .select(col("row_id")).as[Long].collect().toSet
    assert(got === exact)
    // sanity on the fixture itself: overlap rows + the duplicate-key
    // rows, never the null row
    assert(exact.contains(20001L) && exact.contains(20002L))
    assert(!exact.contains(20000L))
    assert(exact.size === 152)
  }

  test("prefilter has no false negatives and actually prunes") {
    val pre = Operators.bloomPrefilter(left, "key", right, "rkey", fpp = 0.01)
      .select(col("row_id")).as[Long].collect().toSet
    assert(exact.subsetOf(pre), "bloom prefilter dropped a true match")
    // at fpp=1% over 10k non-matching rows, surviving non-matches
    // should be on the order of 100; 10× slack keeps the test stable
    // across sketch internals
    assert(pre.size <= exact.size + 1000,
      s"prefilter kept ${pre.size} rows — not pruning")
  }

  test("tiny fpp still exact; degenerate empty right yields empty result") {
    val tight = Operators.semiJoinBloom(left, "key", right, "rkey", fpp = 1e-6)
      .select(col("row_id")).as[Long].collect().toSet
    assert(tight === exact)
    val empty = Operators.semiJoinBloom(left, "key",
      Seq.empty[String].toDF("rkey"), "rkey")
    assert(empty.count() === 0L)
  }

  test("probe stays codegen: prefilter is a Filter before any join") {
    // local relations are eagerly folded by ConvertToLocalRelation —
    // back the fixture with parquet so the plan shows the real scan
    val dir = tmpDir("bloomplan")
    left.write.mode("overwrite").parquet(s"$dir/l")
    right.write.mode("overwrite").parquet(s"$dir/r")
    val lp = spark.read.parquet(s"$dir/l")
    val rp = spark.read.parquet(s"$dir/r")
    val plan = Operators.semiJoinBloom(lp, "key", rp, "rkey")
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("might_contain"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }
}
