package graft.storage

import graft.{Engine, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-statement transactions (A24,
  * `/root/reference/backend/session.go:87-145`): atomic multi-table
  * publish, rollback, read-your-writes, and conflict aborts. */
class TransactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(): Engine = new Engine(spark, tmpDir("graft_txn_wh"))

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("two tables mutated in one txn appear atomically; rollback leaves both untouched") {
    val e = freshEngine()
    e.createTable("a", schema, Seq("id"))
    e.createTable("b", schema, Seq("id"))
    e.table("a").insert(Seq((1L, "a0")).toDF("id", "v"))
    e.table("b").insert(Seq((1L, "b0")).toDF("id", "v"))

    // a second engine over the same warehouse = the concurrent reader
    val reader = new Engine(spark, e.warehouse)

    // --- rollback: nothing ever visible
    e.begin()
    e.table("a").insert(Seq((2L, "a1")).toDF("id", "v"))
    e.table("b").insert(Seq((2L, "b1")).toDF("id", "v"))
    // read-your-writes inside the txn...
    assert(e.table("a").read().count() === 2)
    // ...but invisible outside
    assert(reader.table("a").read().count() === 1)
    assert(reader.table("b").read().count() === 1)
    e.rollback()
    assert(reader.table("a").read().count() === 1)
    assert(reader.table("b").read().count() === 1)
    assert(e.table("a").read().count() === 1) // txn closed: back to published state

    // --- commit: both tables flip together
    e.begin()
    e.table("a").insert(Seq((2L, "a1")).toDF("id", "v"))
    e.table("a").update(col("id") === 1L, Map("v" -> lit("a0x")))
    e.table("b").insert(Seq((2L, "b1")).toDF("id", "v"))
    assert(reader.table("a").read().count() === 1) // still pre-txn
    e.commit()
    assert(reader.table("a").read().orderBy("id").select("v").as[String].collect()
      === Array("a0x", "a1"))
    assert(reader.table("b").read().count() === 2)
  }

  test("interleaved multi-statement DML in one txn publishes one version per table") {
    val e = freshEngine()
    e.createTable("t", schema, Seq("id"))
    e.table("t").insert(Seq((1L, "x")).toDF("id", "v"))
    val vBefore = e.table("t").manifest.version
    e.begin()
    e.table("t").insert(Seq((2L, "y")).toDF("id", "v"))
    e.table("t").delete(col("id") === 1L)
    e.table("t").insert(Seq((3L, "z")).toDF("id", "v"))
    e.commit()
    val t = e.table("t")
    assert(t.read().orderBy("id").select("id").as[Long].collect() === Array(2L, 3L))
    // many statements, ONE published journal slot
    assert(t.manifest.version === vBefore + 1)
  }

  test("txn conflicts with an outside writer: clean abort, outside write survives") {
    val e = freshEngine()
    e.createTable("t", schema, Seq("id"))
    e.table("t").insert(Seq((1L, "x")).toDF("id", "v"))

    val outside = new Engine(spark, e.warehouse)
    e.begin()
    e.table("t").delete(col("id") === 1L) // stages against version read now
    // outside writer lands first
    outside.table("t").insert(Seq((2L, "y")).toDF("id", "v"))
    intercept[java.util.ConcurrentModificationException] { e.commit() }
    // outside write intact, txn's delete never applied
    assert(outside.table("t").read().orderBy("id").select("id").as[Long].collect()
      === Array(1L, 2L))
    // journal still writable after the abort (aborted slot is skipped over)
    outside.table("t").insert(Seq((3L, "z")).toDF("id", "v"))
    assert(outside.table("t").read().count() === 3)
  }

  test("merge and truncate stage inside a txn too") {
    val e = freshEngine()
    e.createTable("t", schema, Seq("id"))
    e.table("t").insert(Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    val reader = new Engine(spark, e.warehouse)

    e.begin()
    e.table("t").merge(Seq((1L, "x2", 1), (3L, "z", 2)).toDF("id", "v", "action"))
    assert(reader.table("t").read().orderBy("id").select("v").as[String].collect()
      === Array("x", "y"))
    e.commit()
    assert(reader.table("t").read().orderBy("id").select("v").as[String].collect()
      === Array("x2", "y", "z"))

    e.begin()
    e.table("t").truncate()
    assert(reader.table("t").read().count() === 3)
    e.rollback()
    assert(e.table("t").read().count() === 3)
  }

  test("vacuum's age gate spares files staged by an open transaction") {
    val e = freshEngine()
    e.createTable("t", schema, Seq("id"))
    e.table("t").insert(Seq((1L, "x")).toDF("id", "v"))
    e.begin()
    e.table("t").insert(Seq((2L, "y")).toDF("id", "v"))
    // staged data files are on disk but referenced by no on-disk
    // manifest yet — a concurrent default vacuum must not collect them
    GraftTable.open(spark, e.warehouse.resolve("main").resolve("t"))
      .vacuum(keepVersions = 1)
    e.commit()
    assert(e.table("t").read().orderBy("id").select("v").as[String].collect()
      === Array("x", "y"))
  }

  test("vacuum anchored at the visible version survives an aborted head") {
    val e = freshEngine()
    e.createTable("t", schema, Seq("id"))
    e.table("t").insert(Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    val outside = new Engine(spark, e.warehouse)
    // txn stages a truncate, then an outside writer causes a conflict
    // abort at commit time — leaving an aborted pending head (files=Nil)
    e.begin()
    e.table("t").truncate()
    outside.table("t").insert(Seq((3L, "z")).toDF("id", "v"))
    intercept[java.util.ConcurrentModificationException] { e.commit() }
    // a keep-1 vacuum must anchor at the VISIBLE version, not the
    // aborted head — otherwise it would delete every live data file
    GraftTable.open(spark, e.warehouse.resolve("main").resolve("t"))
      .vacuum(keepVersions = 1, minAgeMs = 0)
    assert(outside.table("t").read().orderBy("id").select("v").as[String].collect()
      === Array("x", "y", "z"))
  }

  test("a committed txn's protocol props do not leak into later versions") {
    val e = freshEngine()
    e.createTable("t", schema, Seq("id"))
    e.begin()
    e.table("t").insert(Seq((1L, "x")).toDF("id", "v"))
    e.commit()
    // the next plain statement's version must be visible WITHOUT the
    // decision file (txn.* stripped on load, not copied forward)
    e.table("t").insert(Seq((2L, "y")).toDF("id", "v"))
    val head = Manifest.loadVersion(
      e.warehouse.resolve("main").resolve("t"),
      Manifest.latestVersion(e.warehouse.resolve("main").resolve("t")).get)
    assert(!head.props.contains(Manifest.PendingProp))
    assert(!head.props.contains(Manifest.TxnDirProp))
    assert(e.table("t").read().count() === 2)
  }
}
