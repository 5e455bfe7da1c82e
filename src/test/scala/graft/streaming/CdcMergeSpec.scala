package graft.streaming

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC fixtures (a)–(e) from FIXTURES.md §4, driven through condense +
  * merge, plus the file-stream end-to-end path with checkpoint resume. */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("pk", LongType), StructField("val", StringType)))

  // (pk, val, action, txn_group, txn_seq, txn_stmt)
  private def events(rows: (Long, String, Int, String, Long, Long)*) =
    rows.toDF("pk", "val", "action", "txn_group", "txn_seq", "txn_stmt")

  private def fresh(): GraftTable =
    GraftTable.create(spark, tmpDir("cdc_tbl"), schema, Seq("pk"))

  private def state(t: GraftTable): Array[(Long, String)] =
    t.read().orderBy("pk").as[(Long, String)].collect()

  test("(a) insert-only batch → blind append") {
    val t = fresh()
    CdcMerge.applyBatch(t, events((1L, "a", 2, "g1", 1, 1), (2L, "b", 2, "g1", 1, 2)))
    assert(state(t) === Array((1L, "a"), (2L, "b")))
  }

  test("(b) delete-only batch") {
    val t = fresh()
    CdcMerge.applyBatch(t, events((1L, "a", 2, "g1", 1, 1), (2L, "b", 2, "g1", 1, 2)))
    CdcMerge.applyBatch(t, events((1L, null, 0, "g1", 2, 1)))
    assert(state(t) === Array((2L, "b")))
  }

  test("(c) insert + update without PK change condenses to last value") {
    val t = fresh()
    CdcMerge.applyBatch(t, events(
      (1L, "a", 2, "g1", 1, 1),
      (1L, "a2", 1, "g1", 1, 2),
      (1L, "a3", 1, "g1", 2, 1)))
    assert(state(t) === Array((1L, "a3")))
  }

  test("(d) general batch incl. update arriving as delete+insert pair") {
    val t = fresh()
    CdcMerge.applyBatch(t, events((1L, "old", 2, "g0", 1, 1), (2L, "keep", 2, "g0", 1, 2)))
    // same txn coords: DELETE (action 0) must lose to INSERT (action 2)
    CdcMerge.applyBatch(t, events(
      (1L, null, 0, "g1", 5, 3),
      (1L, "new", 2, "g1", 5, 3)))
    assert(state(t) === Array((1L, "new"), (2L, "keep")))
  }

  test("(e) stale replay: re-applying the same batch is idempotent") {
    val t = fresh()
    val b = events((1L, "x", 2, "g1", 1, 1), (2L, "y", 2, "g1", 1, 2),
      (1L, "x2", 1, "g1", 2, 1))
    CdcMerge.applyBatch(t, b)
    val s1 = state(t)
    CdcMerge.applyBatch(t, b) // replay
    assert(state(t) === s1)
  }

  test("condense keeps exactly one row per PK ordered by txn coords") {
    val c = CdcMerge.condense(events(
      (1L, "v1", 2, "g1", 1, 1),
      (1L, "v2", 1, "g1", 1, 2),
      (1L, "v0", 1, "g0", 9, 9), // earlier group loses
      (2L, "w", 2, "g1", 1, 1)), Seq("pk"))
    val rows = c.orderBy("pk").select("pk", "val").as[(Long, String)].collect()
    assert(rows === Array((1L, "v2"), (2L, "w")))
  }

  test("replica filtering keeps included and drops excluded tables") {
    val ev = Seq(
      ("db1", "users", 1L), ("db1", "orders", 2L), ("db2", "users", 3L))
      .toDF("db", "tbl", "v")
    val inc = CdcMerge.filterTables(ev, "db", "tbl",
      include = Set(("db1", "users"), ("db2", "users")))
    assert(inc.select("v").as[Long].collect().sorted === Array(1L, 3L))
    val exc = CdcMerge.filterTables(ev, "db", "tbl",
      exclude = Set(("db1", "orders")))
    assert(exc.select("v").as[Long].collect().sorted === Array(1L, 3L))
  }

  test("(C3) JSON row-image decode feeds condense + merge end-to-end") {
    val t = fresh()
    val wire = Seq(
      ("""{"pk": 1, "val": "a"}""", 2, "g1", 1L, 1L),
      ("""{"pk": 2, "val": "b"}""", 2, "g1", 1L, 2L),
      ("""{"pk": 1, "val": "a2"}""", 1, "g1", 2L, 1L))
      .toDF("payload", "action", "txn_group", "txn_seq", "txn_stmt")
    val decoded = CdcMerge.decodeJsonEvents(wire, "payload", schema)
    assert(decoded.columns.toSeq ===
      Seq("pk", "val", "action", "txn_group", "txn_seq", "txn_stmt"))
    CdcMerge.applyBatch(t, decoded)
    assert(state(t) === Array((1L, "a2"), (2L, "b")))
  }

  test("(C9) TRUNCATE event in stream: wipes prior state, later rows apply") {
    val t = fresh()
    CdcMerge.applyBatch(t, events((1L, "a", 2, "g1", 1, 1), (2L, "b", 2, "g1", 1, 2)))
    // batch: one pre-truncate row (superseded), the truncate, one post-row
    CdcMerge.applyBatch(t, events(
      (3L, "pre", 2, "g2", 1, 1),
      (0L, null, 9, "g2", 2, 1),   // TRUNCATE TABLE event
      (4L, "post", 2, "g2", 3, 1)))
    assert(state(t) === Array((4L, "post")))
  }

  test("composite primary key: condense + merge key on all pk columns") {
    val schema2 = StructType(Seq(
      StructField("k1", LongType), StructField("k2", StringType),
      StructField("val", StringType)))
    val t = GraftTable.create(spark, tmpDir("cdc_cpk"), schema2, Seq("k1", "k2"))
    def ev2(rows: (Long, String, String, Int, Long)*) =
      rows.toDF("k1", "k2", "val", "action", "txn_seq")
        .withColumn("txn_group", org.apache.spark.sql.functions.lit("g"))
        .withColumn("txn_stmt", org.apache.spark.sql.functions.lit(0L))
    CdcMerge.applyBatch(t, ev2(
      (1L, "a", "v1", 2, 1), (1L, "b", "v2", 2, 2), (2L, "a", "v3", 2, 3)))
    // same k1, different k2 must NOT collide
    assert(t.read().count() === 3)
    CdcMerge.applyBatch(t, ev2(
      (1L, "a", "v1x", 1, 4),   // update (1,a)
      (1L, "b", null, 0, 5)))   // delete (1,b)
    assert(t.read().orderBy("k1", "k2").as[(Long, String, String)].collect()
      === Array((1L, "a", "v1x"), (2L, "a", "v3")))
  }

  test("read-your-writes: processAllAvailable drains pending CDC before a query") {
    // the reference flushes the delta buffer before serving any data
    // query (backend/executor.go:55-61); the Spark analog is draining
    // the micro-batch queue, then reading the table snapshot.
    val t = fresh()
    val src = tmpDir("ryw_src")
    val ckpt = tmpDir("ryw_ckpt")
    val evSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pk", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("val", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("action", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("txn_group", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("txn_seq", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("txn_stmt", org.apache.spark.sql.types.LongType)))
    val q = CdcMerge.start(spark, src.toString + "/*", evSchema, t, ckpt.toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      events((1L, "a", 2, "g1", 1, 1)).write.parquet(src.toString + "/b1")
      q.processAllAvailable() // the flush-before-query barrier
      assert(state(t) === Array((1L, "a")))
      events((1L, "a2", 1, "g1", 2, 1)).write.parquet(src.toString + "/b2")
      q.processAllAvailable()
      assert(state(t) === Array((1L, "a2")))
    } finally q.stop()
  }

  test("end-to-end file stream with checkpoint: batches applied in order, resume works") {
    val t = fresh()
    val src = tmpDir("cdc_src")
    val ckpt = tmpDir("cdc_ckpt")
    val evSchema = StructType(Seq(
      StructField("pk", LongType), StructField("val", StringType),
      StructField("action", IntegerType), StructField("txn_group", StringType),
      StructField("txn_seq", LongType), StructField("txn_stmt", LongType)))

    events((1L, "a", 2, "g1", 1, 1), (2L, "b", 2, "g1", 1, 2))
      .write.mode("append").parquet(src.toString + "/b1")
    // file source watches a flat dir; write file sets under one dir
    val q1 = CdcMerge.start(spark, src.toString + "/*", evSchema, t, ckpt.toString)
    q1.awaitTermination()
    assert(state(t) === Array((1L, "a"), (2L, "b")))

    events((1L, "a2", 1, "g2", 1, 1), (3L, "c", 2, "g2", 1, 2))
      .write.mode("append").parquet(src.toString + "/b2")
    val q2 = CdcMerge.start(spark, src.toString + "/*", evSchema, t, ckpt.toString)
    q2.awaitTermination()
    // b1 not re-applied (checkpoint), b2 applied
    assert(state(t) === Array((1L, "a2"), (2L, "b"), (3L, "c")))
  }
}
