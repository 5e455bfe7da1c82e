package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level PK min/max stats + merge probe pruning (the reference's
  * ART-index point lookup, `/root/reference/delta/controller.go:481-488`,
  * re-expressed as copy-on-write file-range pruning). */
class FileStatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("val", StringType)))

  private def mkTable(name: String): GraftTable =
    GraftTable.create(spark, tmpDir(name), schema, Seq("pk"))

  test("writes record per-file PK min/max from parquet footers") {
    val t = mkTable("stats_record")
    t.insert(Seq((1L, "a"), (5L, "b")).toDF("pk", "val").coalesce(1))
    t.insert(Seq((100L, "x"), (200L, "y")).toDF("pk", "val").coalesce(1))
    val m = t.manifest
    assert(m.files.size === 2)
    val ranges = m.files.map(f => m.fileStats(f)("pk")).sortBy(_.head.toLong)
    assert(ranges === Seq(Seq("1", "5"), Seq("100", "200")))
  }

  test("stats survive the manifest JSON round-trip") {
    val t = mkTable("stats_json")
    t.insert(Seq((7L, "a")).toDF("pk", "val").coalesce(1))
    // force a re-load from disk (manifest accessor always re-reads)
    val m = Manifest.load(t.path)
    assert(m.fileStats.values.head("pk") === Seq("7", "7"))
  }

  test("merge touching one key range probes only overlapping files") {
    val t = mkTable("stats_prune")
    // three disjoint key-range files
    t.insert((1L to 10L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    t.insert((1000L to 1010L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    t.insert((5000L to 5010L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    val before = t.manifest.files
    assert(before.size === 3)
    spark.conf.set("spark.graft.merge.rewriteAllMaxBytes", "0") // force probe path
    try {
      t.merge(Seq((1005L, "updated", 1)).toDF("pk", "val", "action"))
      // pruning: only the middle file overlaps [1005, 1005]
      assert(GraftTable.lastProbeFiles.size === 1)
      assert(GraftTable.lastProbeFiles.head === before(1))
      // untouched files carried over by reference, not rewritten
      val after = t.manifest.files
      assert(after.contains(before(0)) && after.contains(before(2)) &&
        !after.contains(before(1)))
      assert(t.read().filter(col("pk") === 1005L).select("val")
        .as[String].collect() === Array("updated"))
      assert(t.read().count() === 32L)
    } finally spark.conf.unset("spark.graft.merge.rewriteAllMaxBytes")
  }

  test("merge outside every file range takes the blind-append path " +
      "with zero probe candidates") {
    val t = mkTable("stats_blind")
    t.insert((1L to 10L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    spark.conf.set("spark.graft.merge.rewriteAllMaxBytes", "0")
    try {
      val before = t.manifest.files
      t.merge(Seq((999L, "new", 2)).toDF("pk", "val", "action"))
      assert(GraftTable.lastProbeFiles.isEmpty) // no file can match
      assert(t.manifest.files.toSet.intersect(before.toSet) === before.toSet)
      assert(t.read().count() === 11L)
    } finally spark.conf.unset("spark.graft.merge.rewriteAllMaxBytes")
  }

  test("string PKs prune in UTF8 binary order") {
    val t = GraftTable.create(spark, tmpDir("stats_str"),
      StructType(Seq(StructField("k", StringType), StructField("v", LongType))),
      Seq("k"))
    t.insert(Seq(("apple", 1L), ("banana", 2L)).toDF("k", "v").coalesce(1))
    t.insert(Seq(("melon", 3L), ("zebra", 4L)).toDF("k", "v").coalesce(1))
    val before = t.manifest.files
    spark.conf.set("spark.graft.merge.rewriteAllMaxBytes", "0")
    try {
      t.merge(Seq(("pear", 9L, 2)).toDF("k", "v", "action"))
      assert(GraftTable.lastProbeFiles === Seq(before(1)))
    } finally spark.conf.unset("spark.graft.merge.rewriteAllMaxBytes")
  }

  test("stats shed with their files; rewrite-all keeps stats fresh") {
    val t = mkTable("stats_shed")
    t.insert(Seq((1L, "a")).toDF("pk", "val").coalesce(1))
    t.insert(Seq((9L, "b")).toDF("pk", "val").coalesce(1))
    // default threshold: tiny table takes the rewrite-all arm
    t.merge(Seq((9L, "b2", 1)).toDF("pk", "val", "action"))
    val m = t.manifest
    assert(m.fileStats.keySet === m.files.toSet) // no orphaned stats
    assert(m.files.forall(m.fileStats.contains)) // rewrite recorded stats
  }

  test("ALTER RENAME keeps stats usable (physical-name keyed)") {
    val t = mkTable("stats_rename")
    t.insert((1L to 5L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    t.insert((900L to 905L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    t.renameColumn("pk", "id")
    val before = t.manifest.files
    spark.conf.set("spark.graft.merge.rewriteAllMaxBytes", "0")
    try {
      t.merge(Seq((902L, "u", 1)).toDF("id", "val", "action"))
      assert(GraftTable.lastProbeFiles === Seq(before(1)))
      assert(t.read().filter(col("id") === 902L).select("val")
        .as[String].collect() === Array("u"))
    } finally spark.conf.unset("spark.graft.merge.rewriteAllMaxBytes")
  }

  test("unique-index columns record stats and prune arbiter-keyed merges") {
    // r15: a merge keyed on a secondary unique arbiter (the
    // omitted-auto-PK REPLACE/ODKU/IGNORE shape) must prune files by
    // the ARBITER column's footer range, not probe every file
    val sch = StructType(Seq(
      StructField("pk", LongType), StructField("em", StringType),
      StructField("n", IntegerType)))
    val t = GraftTable.create(spark, tmpDir("stats_uq"), sch, Seq("pk"),
      props = Map("unique.uq_em" -> "em"))
    t.insert(Seq((1L, "a1", 1), (2L, "a2", 1), (3L, "a3", 1))
      .toDF("pk", "em", "n").coalesce(1))
    t.insert(Seq((4L, "b1", 1), (5L, "b2", 1), (6L, "b3", 1))
      .toDF("pk", "em", "n").coalesce(1))
    val m = t.manifest
    val before = m.files
    assert(before.size === 2)
    // the unique column's range rode the footer read alongside the PK's
    assert(m.files.forall(f => m.fileStats(f).contains("em")))
    spark.conf.set("spark.graft.merge.rewriteAllMaxBytes", "0")
    try {
      t.replaceRows(Seq((100L, "b2", 9)).toDF("pk", "em", "n"), Seq("em"))
      // only the b-range file overlaps [b2, b2]
      assert(GraftTable.lastProbeFiles === Seq(before(1)))
      assert(t.read().orderBy("em").as[(Long, String, Int)].collect().toSeq
        === Seq((1L, "a1", 1), (2L, "a2", 1), (3L, "a3", 1),
          (4L, "b1", 1), (100L, "b2", 9), (6L, "b3", 1)))
    } finally spark.conf.unset("spark.graft.merge.rewriteAllMaxBytes")
  }

  test("ALTER MODIFY disables pruning on the retyped column, merge stays correct") {
    val t = mkTable("stats_modify")
    t.insert((1L to 5L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    t.insert((90L to 95L).map(i => (i, s"v$i")).toDF("pk", "val").coalesce(1))
    t.modifyColumnType("pk", StringType) // old stats live in LONG space
    spark.conf.set("spark.graft.merge.rewriteAllMaxBytes", "0")
    try {
      t.merge(Seq(("3", "u3", 1)).toDF("pk", "val", "action"))
      // both files stay candidates — no wrong-typed comparison
      assert(GraftTable.lastProbeFiles.size === 2)
      assert(t.read().filter(col("pk") === "3").select("val")
        .as[String].collect() === Array("u3"))
    } finally spark.conf.unset("spark.graft.merge.rewriteAllMaxBytes")
  }
}
