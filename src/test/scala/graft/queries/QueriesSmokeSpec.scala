package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Every declared query must execute at sf0.001 (guards Bench/Verify
  * against runtime failures), plus the quantitative claims that have no
  * oracle: the HLL approx-distinct error bound.
  */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all declared queries run and the oracle map stays aligned") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracle key has a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    val failures = qs.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle SQL is single-line and JSON-safe") {
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(!v.contains("\n"), s"$k oracle has newline")
      assert(!v.contains("\t"), s"$k oracle has tab")
    }
  }

  test("approx_count_distinct stays within 10% of exact counts") {
    val rows = SparkEntry.queries("q31_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    // exact counts cross-checked independently; bound flags all true
    val li = graft.Tables.load(spark, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (p, o) = exact(r.getString(0))
      assert(r.getLong(1) === p && r.getLong(2) === o)
      assert(r.getBoolean(3) && r.getBoolean(4), r.toString)
    }
  }

  test("heavy-hitter output is the exact over-threshold token set") {
    val out = SparkEntry.queries("q56_heavy_hitter_sources")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.nonEmpty) // the fixture corpus has over-threshold tokens
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val total = toks.count()
    val expected = toks.groupBy("token").count()
      .filter(col("count") > total / 32.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.toMap === expected)
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
