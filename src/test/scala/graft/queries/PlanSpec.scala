package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Physical-plan shape assertions: the properties that make these
  * queries scale (filter pushdown to parquet, column pruning, broadcast
  * joins for dims, partial aggregation, no cartesian products where a
  * key join exists) are locked in here so a plan regression fails the
  * suite, not just the benchmark.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q01: scan reads only the needed columns (pruning)") {
    val p = plan("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_returnflag"), readSchema)
  }

  test("q02: small dimensions are broadcast, not shuffled") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q05: every predicate reaches the scan") {
    val p = plan("q05_forecast_revenue")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("l_discount"), pushed)
    assert(pushed.contains("l_quantity"), pushed)
    assert(pushed.contains("l_shipdate"), pushed)
  }

  test("q08: semi join stays a join (no row explosion)") {
    val p = plan("q08_semi_join")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q01: aggregation is two-phase (map-side partial combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(3000))
  }

  test("q40: condense is a single hash aggregate, not a window sort") {
    val p = plan("q40_cdc_condense")
    assert(p.contains("max_by") || p.contains("partial_max_by"), p.take(3000))
    assert(!p.contains("Window"), "condense must not plan a window")
  }

  test("q49: distribution functions never plan a single-partition window") {
    // Window.orderBy with no partition key would plan
    // `Exchange SinglePartition` + one task sorting the whole table;
    // globalRank's range-slice + prefix-sum formulation must not.
    val p = plan("q49_ntile_distribution")
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
    assert(p.contains("hashpartitioning(__pid"), p.take(3000))
  }

  test("q61: pair scan has no shuffle beyond the explicit repartition") {
    val p = plan("q61_jaccard_pairs")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // r18: the dense route recodes the hot vocabulary to fixed-width
    // bitmaps when it fits (bitmapandcount); the merge-walk intersect
    // (sortedintersectcount) remains the over-vocab fallback
    assert(p.contains("bitmapandcount") || p.contains("sortedintersectcount"),
      "native intersect in plan")
    // the quadratic pair stream is never shuffled on the pair key —
    // only per-doc aggregation shuffles (pre-join) and the final sort
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(e =>
      e.contains("hashpartitioning(a_id") && e.contains("b_id")),
      "pair-keyed shuffle found:\n" + exchanges.mkString("\n"))
  }

  test("q61/q72: cheap id conjunct leads the pair-scan join condition") {
    // the expensive per-pair kernel (intersect / dot product) must sit
    // AFTER the id test in the authored join condition — a separate
    // .filter gets pushed in as the LEADING conjunct and the kernel
    // then runs for all n² ordered pairs (2× the work)
    for ((q, kernel) <- Seq("q61_jaccard_pairs" -> "bitmapandcount",
                            "q72_cosine_pairs" -> "vecdot")) {
      val line = plan(q).linesIterator
        .find(l => l.contains("Join") && l.contains(kernel))
        .getOrElse(fail(s"$q: no join line containing $kernel"))
      val idTest = line.indexOf("< b_id")
      assert(idTest >= 0 && idTest < line.indexOf(kernel),
        s"$q: id test does not lead the join condition:\n$line")
    }
  }

  test("q89: prefix-filtered pairs stay keyed — no broadcast of the corpus") {
    // the sparse-corpus path must be pure keyed shuffles: an inverted-
    // index equi-join on the prefix code, never a nested-loop over a
    // broadcast corpus (that's q61's dense-corpus plan) and never a
    // cartesian product
    val p = plan("q89_jaccard_prefix")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("sortedintersectcount"), "native intersect in verify stage")
  }

  test("q31: distinct counts avoid the multi-distinct Expand") {
    // two DISTINCT columns in one aggregate would Expand the scan 3×;
    // the dedup-first formulation must keep Expand out of the plan
    val p = plan("q31_approx_distinct")
    assert(!p.contains("Expand"), p.take(3000))
  }

  test("q70: native vec_dot in plan + bounded-state top-k aggregation") {
    val p = plan("q70_knn_brute")
    assert(p.contains("vecdot"), "native expression should appear in plan")
    // ranking is the TopK aggregator, planned as a two-phase object
    // hash aggregate: partitions combine down to k rows per query
    // before the exchange, with NO sort of the candidate matrix (the
    // window formulation's WindowGroupLimit still locally sorts every
    // partition; the aggregator does O(k) ordered insertion instead)
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(p.contains("partial_topk"), p.take(3000))
    assert(!p.contains("Window"), "top-k must not plan a window")
    // the only sort left is the k-row presentation sort
    val sorts = p.linesIterator.filter(_.trim.startsWith("+- Sort")).toSeq
    assert(sorts.size <= 1, "candidate-matrix sort found:\n" + sorts.mkString("\n"))
  }

  test("q71/q73: ANN ranking and IVF cell assignment plan no window") {
    // same property as q70 for the bucketed paths — and q73's cell
    // ASSIGNMENT too: a window over the n×|cells| matrix would shuffle
    // every (vector, centroid) pair; the top-2 aggregator combines
    // map-side
    for (q <- Seq("q71_ann_lsh", "q73_ann_ivf")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q must not plan a window:\n" + p.take(2000))
      assert(p.contains("partial_topk"), s"$q: " + p.take(2000))
    }
  }

  test("q64: netsums ride ONE aggregation — no 31× bit explode") {
    // the signature folds 31 independent sums in a single doc-keyed
    // hash aggregate; the old shape exploded sequence(0,30) (a Generate
    // node) and paid a second doc-keyed shuffle over 31× the rows
    val p = plan("q64_simhash")
    val generates = p.linesIterator.count(_.contains("Generate "))
    assert(generates == 1, // the word split only, never the bit fan-out
      s"expected exactly the word-split Generate, got $generates:\n${p.take(3000)}")
    assert(p.contains("partial_sum"), "map-side partial netsums")
  }

  test("q64: single-aggregation netsums match the explode formulation") {
    import org.apache.spark.sql.functions._
    val s = spark
    val docs = graft.SparkEntry.queries("q64_simhash")(s, dir)
    // independent re-computation via the original 31× explode shape
    val wc = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("code", expr(graft.queries.HashFrags.wordCodeSpark("word")))
    val oldShape = wc
      .select(col("doc_id"), col("cnt"), col("code"),
        explode(expr("sequence(0, 30)")).as("bit"))
      .withColumn("contrib", col("cnt") * (expr("(code >> bit) & 1") * 2 - 1))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("contrib")).as("net"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("net") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(0L)).as("simhash"))
    assert(docs.collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).sorted ===
      oldShape.collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).sorted)
  }

  test("q68: scrub is one narrow projection — only repartition + sort exchanges") {
    val p = plan("q68_pii_redaction")
    // the explicit compute-spread repartition and the presentation sort
    // are the ONLY exchanges; the scrub itself never shuffles
    val exchanges = p.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange") || l.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"$exchanges exchanges:\n${p.take(2500)}")
    assert(!p.contains("Window"), p.take(2000))
  }

  test("q69: keeper argmax is an aggregation, never a per-cluster window sort") {
    val p = plan("q69_canonical_selection")
    assert(!p.contains("Window"), p.take(2500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2500))
    // two-phase agg: map-side partial max(struct) before the shuffle
    assert(p.contains("partial_max"), p.take(2500))
  }

  test("q100: the bigram model's exchange is built once and reused") {
    // perDoc feeds BOTH the model aggregation and the instance side of
    // the join; exchange reuse (an AQE runtime decision — only the
    // FINAL adaptive plan shows it) means the corpus is tokenized and
    // shuffled once, not twice
    val df = SparkEntry.queries("q100_lm_familiarity")(spark, dir)
    val qe = df.queryExecution
    qe.toRdd.count()
    val p = qe.executedPlan.toString
    assert(p.contains("ReusedExchange"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q101: per-source cap is a bounded-state aggregation, not a window sort") {
    // the oracle's row_number() formulation shuffles and sorts every
    // document; the TopK sketch shuffles k-row summaries per partition
    val p = plan("q101_source_cap")
    assert(!p.contains("Window"), p.take(3000))
    // typed Aggregator plans as ObjectHashAggregate with a partial phase
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    assert(p.contains("partial_"), p.take(3000))
  }

  test("partitioned parent: a bounds-contradicting WHERE prunes child branches") {
    // each union branch carries its recorded bounds as a filter, so
    // Catalyst folds `id >= 100 AND id < 10` to false and drops the
    // branch entirely (PropagateEmptyRelation) — PG partition pruning.
    // At 100 TB this is one partition scanned instead of all of them.
    import graft.{Engine, SqlRouter}
    val e = new Engine(spark, tmpDir("plan_partprune"))
    def run(q: String): Unit = SqlRouter.execute(e, q)
    run("CREATE TABLE pp (id BIGINT, v STRING) PARTITION BY RANGE (id)")
    run("CREATE TABLE pp_a PARTITION OF pp FOR VALUES FROM (0) TO (100)")
    run("CREATE TABLE pp_b PARTITION OF pp FOR VALUES FROM (100) TO (200)")
    run("INSERT INTO pp VALUES (5, 'a'), (150, 'b')")
    val df = SqlRouter.execute(e, "SELECT v FROM pp WHERE id = 150").df.get
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected a single surviving child scan:\n$p")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("b"))
  }
}
