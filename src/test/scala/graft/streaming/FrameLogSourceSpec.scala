package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The C1/C2 transport: a `MicroBatchStream` tailing an append-only
  * frame log with per-slot byte offsets (reference anchor: the live
  * slot-consume + LSN-feedback loop,
  * `/root/reference/pgserver/logrepl/replication.go:222-683`), feeding
  * the byte-level pgoutput decoder and the merge pipeline. */
class FrameLogSourceSpec extends SparkSpec {
  import spark.implicits._

  // pgoutput message encoder (same independent source of truth as
  // PgOutputDecoderSpec)
  private def be(n: Long, bytes: Int): Array[Byte] =
    (0 until bytes).map(i => ((n >> (8 * (bytes - 1 - i))) & 0xff).toByte).toArray
  private def cstr(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
  private def bytes(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }
  private def begin(lsn: Long, xid: Long): Array[Byte] =
    bytes(Array('B'.toByte), be(lsn, 8), be(0L, 8), be(xid, 4))
  private def commit(lsn: Long): Array[Byte] =
    bytes(Array('C'.toByte, 0.toByte), be(lsn, 8), be(lsn + 1, 8), be(0L, 8))
  private def relation(oid: Int, ns: String, name: String,
      cols: (String, Int, Int)*): Array[Byte] =
    bytes(Seq(Array('R'.toByte), be(oid, 4), cstr(ns), cstr(name),
      Array('d'.toByte), be(cols.size, 2)) ++
      cols.flatMap { case (cn, typ, mod) =>
        Seq(Array(0.toByte), cstr(cn), be(typ, 4), be(mod.toLong & 0xffffffffL, 4))
      }: _*)
  private def tup(vals: Option[String]*): Array[Byte] =
    bytes(Seq(be(vals.size, 2)) ++ vals.map {
      case Some(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        bytes(Array('t'.toByte), be(b.length, 4), b)
      case None => Array('n'.toByte)
    }: _*)
  private def insert(oid: Int, t: Array[Byte]): Array[Byte] =
    bytes(Array('I'.toByte), be(oid, 4), Array('N'.toByte), t)
  private def update(oid: Int, t: Array[Byte]): Array[Byte] =
    bytes(Array('U'.toByte), be(oid, 4), Array('N'.toByte), t)
  private def delete(oid: Int, key: Array[Byte]): Array[Byte] =
    bytes(Array('D'.toByte), be(oid, 4), Array('K'.toByte), key)

  private val relOid = 16384
  private def rel = relation(relOid, "public", "t",
    ("pk", 20, -1), ("val", 1043, -1))
  private val rowSchema = StructType(Seq(
    StructField("pk", LongType), StructField("val", StringType)))

  private def readLog(dir: java.nio.file.Path): DataFrame =
    spark.read.format("framelog").load(dir.toString)

  test("batch read returns complete frames with slot and offset") {
    val dir = tmpDir("framelog_batch")
    FrameLog.append(dir, "s1", Seq(10L -> Array[Byte](1, 2, 3), 11L -> Array[Byte](4)))
    FrameLog.append(dir, "s2", Seq(5L -> Array[Byte](9, 9)))
    val out = readLog(dir).as[(String, Long, Array[Byte])].collect()
      .map { case (s, o, p) => (s, o, p.toSeq) }.sortBy(r => (r._1, r._2))
    assert(out === Array(
      ("s1", 10L, Seq[Byte](1, 2, 3)),
      ("s1", 11L, Seq[Byte](4)),
      ("s2", 5L, Seq[Byte](9, 9))))
  }

  test("a torn tail record is invisible until its bytes complete") {
    val dir = tmpDir("framelog_torn")
    FrameLog.append(dir, "s1", Seq(1L -> Array[Byte](7)))
    // hand-write a record header claiming 100 payload bytes, supply 2
    val f = dir.resolve("s1" + FrameLog.Suffix)
    val out = java.nio.file.Files.newOutputStream(f,
      java.nio.file.StandardOpenOption.APPEND)
    out.write(be(2L, 8)); out.write(be(100, 4)); out.write(Array[Byte](0, 0))
    out.close()
    assert(readLog(dir).count() === 1L) // only the complete frame
    // finishing the payload makes it visible
    val fin = java.nio.file.Files.newOutputStream(f,
      java.nio.file.StandardOpenOption.APPEND)
    fin.write(new Array[Byte](98))
    fin.close()
    assert(readLog(dir).count() === 2L)
  }

  test("streaming: maxFramesPerTrigger splits the log into micro-batches") {
    val dir = tmpDir("framelog_split")
    val ckpt = tmpDir("framelog_split_ckpt")
    FrameLog.append(dir, "s1", (0 until 5).map(i => i.toLong -> Array(i.toByte)))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("framelog")
      .option("maxFramesPerTrigger", "2")
      .load(dir.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batchSizes += batch.count()
        ()
      }.start()
    q.awaitTermination()
    assert(batchSizes.toSeq === Seq(2L, 2L, 1L))
  }

  test("framelog → stateful pgoutput decode → merge: txn split across " +
      "three micro-batches, restart mid-transaction") {
    val dir = tmpDir("framelog_e2e")
    val ckpt = tmpDir("framelog_e2e_ckpt")
    val table = GraftTable.create(spark, tmpDir("framelog_e2e_tbl"),
      rowSchema, Seq("pk"))

    def run(): Unit = {
      val q = spark.readStream.format("framelog")
        .option("maxFramesPerTrigger", "2")
        .load(dir.toString)
        .transform(PgOutputDecoder.decodeSlotStreamsStateful(
          _, "slot", "off", "payload", "public.t", rowSchema))
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          CdcMerge.applyBatch(table,
            batch.withColumn("action", col("action").cast("int")))
        }.start()
      q.awaitTermination()
    }

    // 6 frames at 2/trigger = 3 micro-batches; the first transaction's
    // Begin/Relation, its rows, and its Commit land in DIFFERENT batches
    FrameLog.append(dir, "s1", Seq(
      0L -> begin(100L, 1), 1L -> rel,
      2L -> insert(relOid, tup(Some("1"), Some("a"))),
      3L -> insert(relOid, tup(Some("2"), Some("b"))),
      4L -> commit(100L),
      5L -> begin(200L, 2))) // second txn left OPEN mid-log
    run()
    assert(table.read().orderBy("pk").as[(Long, String)].collect() ===
      Array((1L, "a"), (2L, "b")))

    // restart mid-transaction: the open txn's coords live in the
    // decoder's checkpointed SlotSnapshot; no Relation re-send needed
    FrameLog.append(dir, "s1", Seq(
      6L -> update(relOid, tup(Some("1"), Some("a2"))),
      7L -> delete(relOid, tup(Some("2"), None)),
      8L -> commit(200L)))
    run()
    assert(table.read().orderBy("pk").as[(Long, String)].collect() ===
      Array((1L, "a2")))
  }

  test("admission control shares the frame budget across slots (no starvation)") {
    val dir = tmpDir("framelog_fair")
    // slot "a" (sorted first) has far more backlog than the budget;
    // a greedy in-order grant would give "z" zero frames every trigger
    FrameLog.append(dir, "a", (0L until 10L).map(i => i -> Array[Byte](i.toByte)))
    FrameLog.append(dir, "z", (0L until 3L).map(i => i -> Array[Byte](i.toByte)))
    val stream = new FrameLogMicroBatchStream(dir.toString, Some(4L),
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
    val first = FrameLogOffset.positions(stream.latestOffset(
      stream.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(4L)))
    val recLen = FrameLog.HeaderLen + 1
    // equal share: 2 frames each, both slots advance
    assert(first("a") === 2L * recLen)
    assert(first("z") === 2L * recLen)
    // second pass hands an idle slot's unused share to the backlog:
    // "z" has 1 frame left, so "a" gets 2 (its share) + 1 (leftover)
    val second = FrameLogOffset.positions(stream.latestOffset(
      FrameLogOffset(first),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(4L)))
    assert(second("z") === 3L * recLen)
    assert(second("a") === 5L * recLen)
  }

  test("two slots read in parallel partitions, new slots join mid-stream") {
    val dir = tmpDir("framelog_slots")
    val ckpt = tmpDir("framelog_slots_ckpt")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def run(): Unit = {
      val q = spark.readStream.format("framelog").load(dir.toString)
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          seen ++= batch.select("slot", "off").as[(String, Long)].collect()
          ()
        }.start()
      q.awaitTermination()
    }
    FrameLog.append(dir, "a", Seq(1L -> Array[Byte](1)))
    run()
    FrameLog.append(dir, "a", Seq(2L -> Array[Byte](2)))
    FrameLog.append(dir, "b", Seq(1L -> Array[Byte](3))) // appears later
    run()
    assert(seen.sorted.toSeq === Seq(("a", 1L), ("a", 2L), ("b", 1L)))
  }
}
