package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Invariants of the corpus-curation pack (q92–q94) — the value-level
  * gate is the DuckDB oracle; these lock the internal consistency and
  * the plan shapes that make the operators scale. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q92: coverage accounting is internally consistent") {
    val rows = SparkEntry.queries("q92_substring_dedup")(spark, dir)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nWords, dupPos, covered, kept) =>
      assert(covered + kept === nWords.toLong, s"doc $id")
      assert(covered <= nWords.toLong && dupPos >= 0, s"doc $id")
      // a duplicated position implies covered words and vice versa
      assert((dupPos > 0) === (covered > 0), s"doc $id")
      // k=8 gram coverage: n duplicated starts cover at most 8n words
      assert(covered <= dupPos * 8, s"doc $id")
    }
    // the corpus has engineered near-dups: some doc must be flagged
    assert(rows.exists(_._3 > 0), "no duplicated 8-gram found at all")
  }

  test("q93: only non-benchmark docs are reported and shares are sane") {
    val rows = SparkEntry.queries("q93_decontamination")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    rows.foreach { case (id, nGrams, nShared, share) =>
      assert(id % 7 != 0L, s"benchmark doc $id reported as contaminated")
      assert(nShared >= 1L && nShared <= nGrams, s"doc $id")
      assert(share > 0.0 && share <= 1.0, s"doc $id")
    }
  }

  test("q94: fraction bounds and the exact-duplicate-free lower bound") {
    val rows = SparkEntry.queries("q94_repetition_metrics")(spark, dir)
      .as[(Long, Int, Int, Double, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, d, dupFrac, top, topFrac) =>
      assert(d >= 1 && d <= n, s"doc $id")
      assert(dupFrac >= 0.0 && dupFrac < 1.0, s"doc $id")
      assert(top >= 1 && top <= n && topFrac <= 1.0, s"doc $id")
      // the most frequent bigram accounts for at least the dup mass
      assert(top - 1 <= n - d, s"doc $id")
    }
  }

  test("q92/q93 plans: corpus is never broadcast; q94 plans no shuffle before the sort") {
    val p92 = SparkEntry.queries("q92_substring_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    // the dup-gram set joins back by a keyed shuffle or a broadcast of
    // the AGGREGATED (small) side — never a nested-loop pair scan
    assert(!p92.contains("BroadcastNestedLoopJoin") && !p92.contains("CartesianProduct"), p92.take(3000))
    val p93 = SparkEntry.queries("q93_decontamination")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p93.contains("BroadcastHashJoin"), "bench gram set should broadcast")
    val p94 = SparkEntry.queries("q94_repetition_metrics")(spark, dir)
      .queryExecution.executedPlan.toString
    // narrow per-doc HOFs: only the explicit compute-spreading
    // round-robin repartition and the presentation sort may exchange
    val exchanges = p94.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size <= 2 && !p94.contains("Generate"),
      "q94 must stay narrow:\n" + exchanges.mkString("\n"))
  }
}
