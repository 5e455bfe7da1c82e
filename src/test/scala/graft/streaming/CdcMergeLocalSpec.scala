package graft.streaming

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import scala.util.Random

/** Pins the r18 driver-side apply path (CdcMerge.applyLocal — the
  * bounded-window single-pass fold) ≡ the distributed truncate-split +
  * condense + merge it replaced. The distributed reference is
  * reproduced here verbatim from the pre-fold applyBatch body and run
  * against a second table; randomized batches cover out-of-order txn
  * coords, delete/insert pairs at identical coords, mid-stream
  * truncates, string txn groups, binary PK cells (Java-array equality
  * trap), and keyless tables.
  */
class CdcMergeLocalSpec extends SparkSpec {

  /** The pre-r18 distributed apply, kept as the semantic reference. */
  private def applyDistributed(table: GraftTable,
      batch: org.apache.spark.sql.DataFrame): Unit = {
    import CdcMerge._
    val probe = batch.agg(count(lit(1)).as("n"),
      sum(when(col(actionCol) === ActionTruncate, 1L).otherwise(0L)).as("nt"))
      .collect()(0)
    if (probe.getLong(0) == 0L) return
    if (!probe.isNullAt(1) && probe.getLong(1) > 0L) {
      val truncs = batch.filter(col(actionCol) === ActionTruncate)
      val order = orderCols.filter(batch.columns.contains)
      val lastTrunc = truncs
        .orderBy(order.map(col(_).desc): _*).limit(1)
        .select(order.map(col): _*).collect()(0)
      val afterTrunc = order.indices.foldRight(lit(false)) { (i, rest) =>
        col(order(i)) > lit(lastTrunc.get(i)) ||
          (col(order(i)) === lit(lastTrunc.get(i)) && rest)
      }
      table.truncate()
      val after = batch.filter(col(actionCol) =!= ActionTruncate && afterTrunc)
      table.merge(condense(after, table.manifest.pkCols))
      return
    }
    table.merge(condense(batch, table.manifest.pkCols))
  }

  private def checkEquiv(schema: StructType, pk: Seq[String],
      rows: Seq[Row], tag: String,
      applyA: (GraftTable, org.apache.spark.sql.DataFrame) => Unit =
        (t, df) => CdcMerge.applyBatch(t, df)): Unit = {
    val a = GraftTable.create(spark, tmpDir(s"cml_a_$tag"), schema, pk)
    val b = GraftTable.create(spark, tmpDir(s"cml_b_$tag"), schema, pk)
    val evSchema = StructType(schema.fields ++ Seq(
      StructField("action", IntegerType),
      StructField("txn_group", StringType),
      StructField("txn_seq", LongType),
      StructField("txn_stmt", LongType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      evSchema)
    applyA(a, df)                       // path under test
    applyDistributed(b, df)             // reference
    val cols = schema.fieldNames.map { f =>
      if (schema(f).dataType == BinaryType) hex(col(f)).as(f) else col(f)
    }.toSeq
    val sa = a.read().select(cols: _*).collect().map(_.toString).sorted
    val sb = b.read().select(cols: _*).collect().map(_.toString).sorted
    assert(sa === sb, s"driver vs distributed apply diverged ($tag)")
    assert(sa.nonEmpty || rows.forall(r =>
      r.getInt(schema.size) == CdcMerge.ActionDelete ||
        r.getInt(schema.size) == CdcMerge.ActionTruncate), tag)
  }

  test("randomized PK batches: LWW, coord order, delete<insert tie") {
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("v", StringType)))
    val rnd = new Random(42)
    for (round <- 0 until 6) {
      // txn_stmt is a unique counter: real decoders never emit two
      // events for one PK at IDENTICAL (group, seq, stmt, action) —
      // and under such a tie max_by itself is arbitrary, so equality
      // is not assertable there
      var stmt = 0L
      val rows = (0 until 120).map { _ =>
        val pk = rnd.nextInt(25).toLong
        val act = rnd.nextInt(3) // 0 delete / 1 update / 2 insert
        stmt += 1
        Row(pk, if (act == 0) null else s"v${rnd.nextInt(9)}",
          act, s"g${rnd.nextInt(3)}", rnd.nextInt(4).toLong, stmt)
      }
      checkEquiv(schema, Seq("pk"), rows, s"rand$round")
    }
  }

  test("mid-stream truncate: rows at/before it superseded, after applied") {
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("v", StringType)))
    val rows = Seq(
      Row(1L, "before", 2, "g1", 1L, 1L),
      Row(2L, "also-before", 2, "g1", 1L, 2L),
      Row(null, null, 9, "g1", 2L, 1L), // TRUNCATE
      Row(3L, "after", 2, "g1", 2L, 2L),
      Row(1L, "re-created", 2, "g1", 3L, 1L))
    checkEquiv(schema, Seq("pk"), rows, "trunc")
  }

  test("keyless table with binary cells: value equality, not reference") {
    val schema = StructType(Seq(
      StructField("b", BinaryType), StructField("n", LongType)))
    // two REFERENCE-distinct but value-equal byte arrays per logical row
    def bytes(k: Int): Array[Byte] = Array.tabulate(4)(i => (k + i).toByte)
    val rows = Seq(
      Row(bytes(1), 10L, 2, "g1", 1L, 1L),
      Row(bytes(1), 10L, 2, "g1", 1L, 2L), // dup full-row image
      Row(bytes(2), 20L, 2, "g1", 1L, 3L),
      Row(bytes(2), 20L, 0, "g1", 2L, 1L)) // delete the second image
    checkEquiv(schema, Nil, rows, "binkeyless")
  }

  test("REAL distributed branch (injectable fold bound) ≡ local path") {
    // r18 ADVICE: with the production threshold every spec batch
    // folds; applyBatchBounded(foldMax=4) forces the LIVE distributed
    // branch of applyBatch through the same randomized shapes, so the
    // real code — not a copy of its old body — is what gets asserted.
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("v", StringType)))
    val rnd = new Random(7)
    var stmt = 0L
    val rows = (0 until 60).map { i =>
      val pk = rnd.nextInt(12).toLong
      val act = if (i == 30) 9 else rnd.nextInt(3) // mid-stream truncate
      stmt += 1
      Row(if (act == 9) null else pk,
        if (act == 0 || act == 9) null else s"v${rnd.nextInt(9)}",
        act, s"g${rnd.nextInt(3)}", rnd.nextInt(4).toLong, stmt)
    }
    checkEquiv(schema, Seq("pk"), rows, "distbranch",
      (t, df) => CdcMerge.applyBatchBounded(t, df, None, foldMax = 4))
  }

  test("over-byte window hint falls through to the distributed path") {
    // r18 verdict #3: a byte hint above FoldMaxBytes must refuse the
    // driver fold BEFORE collecting — results stay identical
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("v", StringType)))
    val rows = Seq(
      Row(1L, "a", 2, "g1", 1L, 1L),
      Row(1L, "b", 2, "g1", 1L, 2L),
      Row(2L, "c", 2, "g1", 1L, 3L))
    checkEquiv(schema, Seq("pk"), rows, "overbyte",
      (t, df) => CdcMerge.applyBatch(t, df,
        Some(CdcMerge.FoldMaxBytes + 1)))
  }

  test("keyless table with -0.0 key cells matches the distributed apply") {
    // r18 ADVICE: boxed Double(-0.0) != 0.0 but Spark's grouping
    // normalizes floating zeros (and emits the normalized key) — a
    // float-typed condense key therefore rejects the driver fold and
    // takes the distributed path; this asserts end-state equality
    val schema = StructType(Seq(
      StructField("d", DoubleType), StructField("n", LongType)))
    val rows = Seq(
      Row(0.0, 1L, 2, "g1", 1L, 1L),
      Row(-0.0, 1L, 2, "g1", 1L, 2L), // same group as (0.0, 1) for Spark
      Row(-0.0, 2L, 2, "g1", 1L, 3L),
      Row(0.0, 2L, 0, "g1", 2L, 1L))  // deletes the (±0.0, 2) image
    checkEquiv(schema, Nil, rows, "negzero")
  }

  test("truncate window with null action/coord rows falls through") {
    // the 3VL divergence case (r18 ADVICE): local fold must defer to
    // the distributed path when a truncate window carries null
    // action/coord cells — equality against the reference proves the
    // fall-through (the old local path kept rows the filter drops)
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("v", StringType)))
    val rows = Seq(
      Row(1L, "before", 2, "g1", 1L, 1L),
      Row(null, null, 9, "g1", 2L, 1L),     // TRUNCATE
      Row(2L, "nullcoord", 2, "g1", null, 2L), // null txn_seq: 3VL drop
      Row(3L, "after", 2, "g1", 3L, 1L))
    checkEquiv(schema, Seq("pk"), rows, "nullhazard")
  }

  test("string txn groups order by utf8 bytes") {
    assert(CdcMerge.utf8Cmp("a", "b") < 0)
    assert(CdcMerge.utf8Cmp("g10", "g2") < 0) // byte order, not numeric
    assert(CdcMerge.utf8Cmp("", "a") < 0)
    assert(CdcMerge.utf8Cmp("é", "z") > 0) // 0xC3... > 0x7A byte-wise
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("v", StringType)))
    val rows = Seq(
      Row(1L, "low", 2, "g10", 1L, 1L),
      Row(1L, "high", 2, "g2", 1L, 1L)) // "g2" > "g10" byte-wise → wins
    checkEquiv(schema, Seq("pk"), rows, "strgroup")
  }
}
