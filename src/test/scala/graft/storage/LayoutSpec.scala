package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-layout strategies for scale: bucketed tables (shuffle-free
  * co-located joins) and partitioned layouts (partition pruning). These
  * lock in the plan properties SURVEY.md's scale notes call for —
  * "co-locate joins via bucketing or pre-partitioning". */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an Exchange on the bucket key") {
    val wh = tmpDir("bucket_wh")
    val db = "bucketdb" + System.nanoTime() % 100000
    spark.sql(s"CREATE DATABASE $db LOCATION '$wh'")
    try {
      val facts = (1 to 10000).map(i => (i.toLong % 500 + 1, i.toDouble)).toDF("k", "v")
      val dims = (1 to 500).map(i => (i.toLong, s"name$i")).toDF("k", "name")
      facts.write.bucketBy(8, "k").sortBy("k").saveAsTable(s"$db.facts")
      dims.write.bucketBy(8, "k").sortBy("k").saveAsTable(s"$db.dims")
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(s"$db.facts").join(spark.table(s"$db.dims"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(1500))
        assert(!plan.contains("Exchange"),
          "bucketed join must not shuffle:\n" + plan.take(2000))
        assert(joined.count() === 10000)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally spark.sql(s"DROP DATABASE $db CASCADE")
  }

  test("clustered compaction: files cover disjoint key ranges (data skipping)") {
    import graft.storage.GraftTable
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", DoubleType)))
    val t = GraftTable.create(spark, tmpDir("cluster_t"), schema, Seq("k"))
    // insert shuffled so unclustered files span the whole key range
    t.insert(scala.util.Random.shuffle((1 to 8000).toList)
      .map(i => (i.toLong, i * 1.0)).toDF("k", "v").repartition(4))
    t.compact(targetRowsPerFile = 2000, clusterBy = Seq("k"))
    val m = t.manifest
    assert(m.files.size === 4)
    // per-file min/max must be disjoint ranges after range clustering
    val ranges = m.files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("k"),
          org.apache.spark.sql.functions.max("k")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $ranges")
      case _ =>
    }
    // a selective filter now touches exactly one file
    val hit = t.read().filter(org.apache.spark.sql.functions.col("k") === 4500L)
      .select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
    assert(hit === 1)
  }

  test("Z-order compaction narrows per-file ranges on BOTH dimensions") {
    import graft.storage.GraftTable
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{min => fmin, max => fmax, col}
    val schema = StructType(Seq(StructField("x", LongType),
      StructField("y", LongType), StructField("v", DoubleType)))
    val t = GraftTable.create(spark, tmpDir("zorder_t"), schema, Seq("x"))
    // two independent dimensions, inserted shuffled
    val rnd = new scala.util.Random(42)
    val rows = rnd.shuffle((0 until 16384).toList).map { i =>
      (i.toLong % 128, (i.toLong / 128) % 128, i * 1.0)
    }
    t.insert(rows.toDF("x", "y", "v").repartition(4))

    def spans(colName: String): Seq[Long] = t.manifest.files.map { f =>
      val r = spark.read.parquet(f)
        .agg(fmin(colName), fmax(colName)).collect()(0)
      r.getLong(1) - r.getLong(0)
    }

    // 1-D clustering on x: y ranges stay ~full-width in every file
    t.compact(targetRowsPerFile = 1024, clusterBy = Seq("x"))
    val oneDimY = spans("y")
    assert(oneDimY.forall(_ > 100), s"1-D layout unexpectedly narrowed y: $oneDimY")

    // Z-order on (x, y): BOTH dimensions narrow per file
    t.compactZOrder("x", "y", targetRowsPerFile = 1024)
    assert(t.manifest.files.size === 16)
    val zx = spans("x"); val zy = spans("y")
    assert(zx.sum.toDouble / zx.size < 64, s"x spans not narrowed: $zx")
    assert(zy.sum.toDouble / zy.size < 64, s"y spans not narrowed: $zy")
    // content survives the rewrite
    assert(t.read().count() === 16384)
    assert(t.read().agg(fmax(col("v"))).collect()(0).getDouble(0) === 16383.0)
  }

  test("partitioned layout prunes partitions for selective filters") {
    val dir = tmpDir("part_layout").resolve("t").toString
    val df = (1 to 5000).map(i => (2020 + i % 5, i.toLong, i * 1.5))
      .toDF("year", "id", "v")
    df.write.partitionBy("year").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("year") === 2023)
    val scan = read.queryExecution.executedPlan.toString
    // partition filter applied at planning: only one of 5 dirs scanned
    assert(scan.contains("PartitionFilters: [isnotnull(year"), scan.take(1500))
    assert(read.count() === 1000)
    // only 1 of the 5 year directories' files are touched
    // (inputFiles ignores pruning — observe the actually-read files)
    val allFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    val readFiles = read.select(input_file_name()).distinct().count()
    assert(readFiles <= allFiles / 4, s"$readFiles of $allFiles files read")
  }
}
