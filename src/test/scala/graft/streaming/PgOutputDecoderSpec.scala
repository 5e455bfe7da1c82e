package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-bytes pgoutput decode (reference C2/C3,
  * `/root/reference/pgserver/logrepl/decode.go`): messages are built
  * byte-for-byte to the public pgoutput layout by an independent
  * encoder below, decoded by [[PgOutputDecoder]], and driven end-to-end
  * through condense + merge into a real table. */
class PgOutputDecoderSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // independent message encoder (the spec's source of truth)

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

  /** TupleData: Some(text) → 't', None → 'n'. */
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

  private def updateKeyChange(oid: Int, old: Array[Byte], nw: Array[Byte]): Array[Byte] =
    bytes(Array('U'.toByte), be(oid, 4), Array('K'.toByte), old,
      Array('N'.toByte), nw)

  private def delete(oid: Int, key: Array[Byte]): Array[Byte] =
    bytes(Array('D'.toByte), be(oid, 4), Array('K'.toByte), key)

  private def truncate(oids: Int*): Array[Byte] =
    bytes(Seq(Array('T'.toByte), be(oids.size, 4), Array(0.toByte)) ++
      oids.map(be(_, 4)): _*)

  /** TupleData with binary ('b') cells; None → 'n'. */
  private def tupB(vals: Option[Array[Byte]]*): Array[Byte] =
    bytes(Seq(be(vals.size, 2)) ++ vals.map {
      case Some(b) => bytes(Array('b'.toByte), be(b.length, 4), b)
      case None => Array('n'.toByte)
    }: _*)

  // streamed-transaction envelope (protocol v2)
  private def streamStart(xid: Long, first: Boolean): Array[Byte] =
    bytes(Array('S'.toByte), be(xid, 4), Array((if (first) 1 else 0).toByte))
  private def streamStop(): Array[Byte] = Array('E'.toByte)
  private def streamCommit(xid: Long, lsn: Long): Array[Byte] =
    bytes(Array('c'.toByte), be(xid, 4), Array(0.toByte), be(lsn, 8),
      be(lsn + 1, 8), be(0L, 8))
  private def streamAbort(xid: Long, subxid: Long): Array[Byte] =
    bytes(Array('A'.toByte), be(xid, 4), be(subxid, 4))
  /** In-stream data messages carry an extra xid after the type byte. */
  private def withXid(xid: Long, msg: Array[Byte]): Array[Byte] =
    bytes(Array(msg(0)), be(xid, 4), msg.drop(1))

  // ------------------------------------------------------------------

  private val relOid = 16384
  private def rel = relation(relOid, "public", "t",
    ("pk", 20, -1), ("val", 1043, -1))

  private def decode(msgs: Seq[Array[Byte]], slot: String = "s1") = {
    val df = msgs.zipWithIndex
      .map { case (m, i) => (slot, i.toLong, m) }
      .toDF("slot", "off", "payload")
    PgOutputDecoder.decodeSlotStreams(df, "slot", "off", "payload",
      "public.t", StructType(Seq(
        StructField("pk", LongType), StructField("val", StringType))))
  }

  test("decodes insert/update/delete with txn coords from Begin LSNs") {
    val out = decode(Seq(
      begin(100L, 7), rel,
      insert(relOid, tup(Some("1"), Some("a"))),
      insert(relOid, tup(Some("2"), None)),
      commit(100L),
      begin(200L, 8),
      update(relOid, tup(Some("1"), Some("a2"))),
      delete(relOid, tup(Some("2"), None)),
      commit(200L)))
      .select("pk", "val", "action", "txn_seq", "txn_stmt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._4, t._5))
    assert(out === Array(
      (1L, "a", CdcMerge.ActionInsert, 100L, 1L),
      (2L, null, CdcMerge.ActionInsert, 100L, 2L),
      (1L, "a2", CdcMerge.ActionUpdate, 200L, 1L),
      (2L, null, CdcMerge.ActionDelete, 200L, 2L)))
  }

  test("update with key change emits delete(old) + insert(new)") {
    val out = decode(Seq(
      begin(50L, 3), rel,
      updateKeyChange(relOid,
        tup(Some("1"), None), tup(Some("9"), Some("moved"))),
      commit(50L)))
      .select("pk", "val", "action", "txn_stmt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._4)
    assert(out === Array(
      (1L, null, CdcMerge.ActionDelete, 1L),
      (9L, "moved", CdcMerge.ActionInsert, 2L)))
  }

  test("truncate emits the table-wide action row") {
    val out = decode(Seq(begin(10L, 1), rel, truncate(relOid), commit(10L)))
      .select("action", "txn_seq").collect()
    assert(out === Array(Row(CdcMerge.ActionTruncate, 10L)))
  }

  test("unchanged-TOAST cells fail loudly unless opted into null") {
    val msgs = Seq(begin(5L, 1), rel,
      update(relOid, bytes(be(2, 2), // 2 cols: pk text, val unchanged
        bytes(Array('t'.toByte), be(1, 4), "1".getBytes("UTF-8")),
        Array('u'.toByte))))
    val df = msgs.zipWithIndex.map { case (m, i) => ("s1", i.toLong, m) }
      .toDF("slot", "off", "payload")
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("val", StringType)))
    val err = intercept[org.apache.spark.SparkException](
      PgOutputDecoder.decodeSlotStreams(df, "slot", "off", "payload",
        "public.t", schema).collect())
    assert(err.getMessage.contains("REPLICA IDENTITY FULL") ||
      Option(err.getCause).exists(_.getMessage.contains("REPLICA IDENTITY FULL")))
    val out = PgOutputDecoder.decodeSlotStreams(df, "slot", "off", "payload",
      "public.t", schema, toastAsNull = true).collect()
    assert(out.length === 1 && out(0).isNullAt(1))
  }

  test("a data message before any Begin fails instead of orphan coords") {
    val msgs = Seq(rel, insert(relOid, tup(Some("1"), Some("a"))))
    val df = msgs.zipWithIndex.map { case (m, i) => ("s1", i.toLong, m) }
      .toDF("slot", "off", "payload")
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("val", StringType)))
    val err = intercept[org.apache.spark.SparkException](
      PgOutputDecoder.decodeSlotStreams(df, "slot", "off", "payload",
        "public.t", schema).collect())
    assert(err.getMessage.contains("transaction boundary") ||
      Option(err.getCause).exists(_.getMessage.contains("transaction boundary")))
  }

  test("messages for other relations are filtered out") {
    val other = relation(99, "public", "other", ("x", 23, -1))
    val out = decode(Seq(
      begin(10L, 1), rel, other,
      insert(99, tup(Some("5"))),
      insert(relOid, tup(Some("1"), Some("a"))),
      commit(10L)))
    assert(out.count() === 1L)
  }

  test("typed text decode per OID incl. numeric typmod, bytea, arrays") {
    val types = relation(relOid, "public", "t",
      ("b", 16, -1), ("i2", 21, -1), ("f8", 701, -1),
      ("num", 1700, (10 << 16 | 2) + 4), ("bin", 17, -1),
      ("d", 1082, -1), ("tsz", 1184, -1), ("arr", 1007, -1),
      ("txt", 1009, -1))
    val df = Seq(("s1", 0L, begin(5L, 1)), ("s1", 1L, types),
      ("s1", 2L, insert(relOid, tup(Some("t"), Some("-7"), Some("2.5"),
        Some("12.3"), Some("\\x00ff10"), Some("2024-03-05"),
        Some("2024-01-02 03:04:05.123456+00"), Some("{1,NULL,3}"),
        Some("""{abc,"x,\"y",NULL}""")))))
      .toDF("slot", "off", "payload")
    val out = PgOutputDecoder.decodeSlotStreams(df, "slot", "off", "payload",
      "public.t", StructType(Seq(
        StructField("b", BooleanType), StructField("i2", ShortType),
        StructField("f8", DoubleType),
        StructField("num", DecimalType(10, 2)),
        StructField("bin", BinaryType), StructField("d", DateType),
        StructField("tsz", TimestampType),
        StructField("arr", ArrayType(IntegerType)),
        StructField("txt", ArrayType(StringType))))).collect()(0)
    assert(out.getBoolean(0) === true)
    assert(out.getShort(1) === -7.toShort)
    assert(out.getDouble(2) === 2.5)
    assert(out.getDecimal(3) === new java.math.BigDecimal("12.30"))
    assert(out.getAs[Array[Byte]](4) === Array(0x00.toByte, 0xff.toByte, 0x10.toByte))
    assert(out.getDate(5).toString === "2024-03-05")
    assert(out.getTimestamp(6).toInstant ===
      java.time.Instant.parse("2024-01-02T03:04:05.123456Z"))
    assert(out.getSeq[Integer](7) === Seq(1, null, 3))
    assert(out.getSeq[String](8) === Seq("abc", "x,\"y", null))
  }

  test("two slots decode independently within one DataFrame") {
    val m1 = Seq(begin(10L, 1), rel, insert(relOid, tup(Some("1"), Some("a"))))
    val m2 = Seq(begin(20L, 2), rel, insert(relOid, tup(Some("2"), Some("b"))))
    val df = (m1.zipWithIndex.map { case (m, i) => ("s1", i.toLong, m) } ++
      m2.zipWithIndex.map { case (m, i) => ("s2", i.toLong, m) })
      .toDF("slot", "off", "payload")
    val out = PgOutputDecoder.decodeSlotStreams(df, "slot", "off", "payload",
      "public.t", StructType(Seq(
        StructField("pk", LongType), StructField("val", StringType))))
      .select("pk", "txn_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out === Array((1L, 10L), (2L, 20L)))
  }

  test("property: random typed tuples round-trip the text-format encode") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    val rel6 = relation(relOid, "public", "t",
      ("pk", 20, -1), ("s", 25, -1), ("b", 16, -1),
      ("num", 1700, (12 << 16 | 3) + 4), ("f", 701, -1), ("arr", 1007, -1))
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("num", DecimalType(12, 3)),
      StructField("f", DoubleType), StructField("arr", ArrayType(IntegerType))))
    // unicode strings force the 4-byte length prefix to be BYTE length;
    // extreme doubles and negative scaled decimals exercise the parse
    val rowGen = for {
      pk <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      s <- Gen.option(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
        'é', '中', '"', '\\', ',', '{', '}', ' ', '\n'))).map(_.mkString))
      b <- Gen.oneOf(true, false)
      num <- Gen.choose(-999999999L, 999999999L)
        .map(n => new java.math.BigDecimal(java.math.BigInteger.valueOf(n), 3))
      f <- Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 1e-300))
      arr <- Gen.option(Gen.listOf(Gen.option(Gen.choose(-1000000, 1000000))))
    } yield (pk, s, b, num, f, arr)
    val rows = samples(rowGen, 60)
    val msgs = Seq(begin(1L, 1), rel6) ++ rows.map { case (pk, s, b, num, f, arr) =>
      insert(relOid, tup(
        Some(pk.toString), s, Some(if (b) "t" else "f"),
        Some(num.toPlainString), Some(f.toString),
        arr.map(_.map {
          case Some(i) => i.toString
          case None => "NULL"
        }.mkString("{", ",", "}"))))
    }
    val df = msgs.zipWithIndex.map { case (m, i) => ("s1", i.toLong, m) }
      .toDF("slot", "off", "payload")
    val out = PgOutputDecoder.decodeSlotStreams(df, "slot", "off", "payload",
      "public.t", schema).orderBy("txn_stmt").collect()
    assert(out.length === rows.length)
    out.zip(rows).foreach { case (r, (pk, s, b, num, f, arr)) =>
      assert(r.getLong(0) === pk)
      assert(Option(r.getString(1)) === s)
      assert(r.getBoolean(2) === b)
      assert(r.getDecimal(3) === num)
      assert(r.getDouble(4) === f)
      assert(Option(r.getSeq[Integer](5))
        .map(_.map(Option(_).map(_.toInt))) === arr.map(_.map(identity)))
    }
  }

  test("property: pg array literals round-trip arbitrary elements") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def render(elems: Seq[Option[String]]): String =
      elems.map {
        case None => "NULL"
        case Some(s) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }.mkString("{", ",", "}")
    val elemGen = Gen.option(Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('"', '\\', ',', '{', '}', ' ', 'ü'))).map(_.mkString))
    (0 until 100).flatMap(i => Gen.listOf(elemGen)
        .apply(Gen.Parameters.default, Seed(11L + i))).foreach { elems =>
      val parsed = PgOutputDecoder.parseArray(render(elems))
      assert(parsed.map(Option(_)) === (if (elems.isEmpty) Nil else elems),
        render(elems))
    }
  }

  test("pgoutput stream: readStream → decode → merge, with resume") {
    // C2 as a live pipeline: message batches land as parquet files of
    // (slot, off, payload); the file stream micro-batches them, each
    // foreachBatch decodes per-slot and merges — the decoder sits in
    // exactly the position the reference's applier holds.
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("val", StringType)))
    val t = GraftTable.create(spark, tmpDir("pgout_stream_tbl"), schema, Seq("pk"))
    val srcDir = tmpDir("pgout_stream_src")
    val ckpt = tmpDir("pgout_stream_ckpt")
    def land(file: String, from: Int, msgs: Seq[Array[Byte]]): Unit =
      msgs.zipWithIndex.map { case (m, i) => ("s1", (from + i).toLong, m) }
        .toDF("slot", "off", "payload")
        .coalesce(1).write.mode("append").parquet(srcDir.toString)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(StructType(Seq(
        StructField("slot", StringType), StructField("off", LongType),
        StructField("payload", BinaryType)))).parquet(srcDir.toString)
      val q = src.writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          CdcMerge.applyBatch(t, PgOutputDecoder.decodeSlotStreams(
            batch, "slot", "off", "payload", "public.t", schema)
            .withColumn("action", col("action").cast("int")))
        }.start()
      q.awaitTermination()
    }
    land("b0", 0, Seq(begin(100L, 1), rel,
      insert(relOid, tup(Some("1"), Some("a"))),
      insert(relOid, tup(Some("2"), Some("b"))), commit(100L)))
    runOnce()
    assert(t.read().orderBy("pk").as[(Long, String)].collect() ===
      Array((1L, "a"), (2L, "b")))
    // NOTE: each micro-batch's decode starts from the Relation messages
    // in that batch — a connector re-sends Relation metadata after
    // restart exactly like PostgreSQL does on a new START_REPLICATION
    land("b1", 100, Seq(begin(200L, 2), rel,
      update(relOid, tup(Some("1"), Some("a2"))),
      delete(relOid, tup(Some("2"), None)), commit(200L)))
    runOnce() // resumes from the checkpoint: only the new file is read
    assert(t.read().orderBy("pk").as[(Long, String)].collect() ===
      Array((1L, "a2")))
  }

  test("decoded stream drives condense + merge end-to-end") {
    val schema = StructType(Seq(
      StructField("pk", LongType), StructField("val", StringType)))
    val t = GraftTable.create(spark, tmpDir("pgout_tbl"), schema, Seq("pk"))
    val msgs = Seq(
      begin(100L, 7), rel,
      insert(relOid, tup(Some("1"), Some("a"))),
      insert(relOid, tup(Some("2"), Some("b"))),
      commit(100L),
      begin(200L, 8),
      update(relOid, tup(Some("1"), Some("a2"))),
      delete(relOid, tup(Some("2"), None)),
      insert(relOid, tup(Some("3"), Some("c"))),
      commit(200L))
    val decoded = decode(msgs)
    CdcMerge.applyBatch(t, decoded.withColumn("action", col("action").cast("int")))
    assert(t.read().orderBy("pk").as[(Long, String)].collect() ===
      Array((1L, "a2"), (3L, "c")))
  }

  test("stateful decode spans micro-batch boundaries mid-transaction") {
    // batch 2 starts MID-transaction and carries no Relation message:
    // the stateless path would fail loudly; the stateful path restores
    // (relation registry, txn coords) from the checkpointed snapshot.
    val src = tmpDir("pgout_stateful_src")
    val ckpt = tmpDir("pgout_stateful_ckpt")
    val schema = StructType(Seq(
      StructField("slot", StringType), StructField("off", LongType),
      StructField("payload", BinaryType)))
    def land(name: String, off0: Long, msgs: Seq[Array[Byte]]): Unit =
      msgs.zipWithIndex.map { case (m, i) => ("s1", off0 + i, m) }
        .toDF("slot", "off", "payload")
        .coalesce(1).write.parquet(src.resolve(name).toString)
    land("b0", 0, Seq(begin(100L, 1), rel,
      insert(relOid, tup(Some("1"), Some("a")))))
    val events = spark.readStream.schema(schema).parquet(src.toString + "/*")
    val q = PgOutputDecoder.decodeSlotStreamsStateful(
      events, "slot", "off", "payload", "public.t",
      StructType(Seq(StructField("pk", LongType), StructField("val", StringType))))
      .writeStream.format("memory").queryName("pgout_stateful")
      .option("checkpointLocation", ckpt.toString)
      .start()
    q.processAllAvailable() // micro-batch 1: Begin + Relation + row 1
    land("b1", 100, Seq( // same txn continues; NO Relation re-send
      insert(relOid, tup(Some("2"), Some("b"))), commit(100L),
      begin(200L, 2), insert(relOid, tup(Some("3"), Some("c"))), commit(200L)))
    q.processAllAvailable() // micro-batch 2: decode state restored
    q.stop()
    val out = spark.table("pgout_stateful")
      .select("pk", "val", "action", "txn_seq", "txn_stmt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._4, t._5))
    assert(out === Array(
      (1L, "a", CdcMerge.ActionInsert, 100L, 1L),
      (2L, "b", CdcMerge.ActionInsert, 100L, 2L),
      (3L, "c", CdcMerge.ActionInsert, 200L, 1L)))
  }

  test("binary tuple cells decode per OID") {
    val oid = 17001
    val cols = Seq(("b_bool", 16, -1), ("b_i2", 21, -1), ("b_i4", 23, -1),
      ("b_i8", 20, -1), ("b_f8", 701, -1), ("b_num", 1700, -1),
      ("b_date", 1082, -1), ("b_tstz", 1184, -1), ("b_txt", 25, -1),
      ("b_arr", 1007, -1), ("b_bytea", 17, -1))
    val st = new PgOutputDecoder.SlotState()
    st.onMessage(begin(100L, 1))
    st.onMessage(relation(oid, "public", "bt", cols: _*))
    // numeric 12345.678 = digits [1,2345,6780], weight 1, dscale 3
    val num = bytes(be(3, 2), be(1, 2), be(0, 2), be(3, 2),
      be(1, 2), be(2345, 2), be(6780, 2))
    val negNum = bytes(be(3, 2), be(1, 2), be(0x4000, 2), be(3, 2),
      be(1, 2), be(2345, 2), be(6780, 2))
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(2000, 1, 1), java.time.LocalDate.of(2024, 3, 15))
    val arr = bytes(be(1, 4), be(1, 4), be(23, 4), be(3, 4), be(1, 4),
      be(4, 4), be(1, 4), be(-1L & 0xffffffffL, 4), be(4, 4), be(3, 4))
    val changes = st.onMessage(insert(oid, tupB(
      Some(Array[Byte](1)),
      Some(be(-5L & 0xffffL, 2)),
      Some(be(123456L, 4)),
      Some(be(-99L, 8)),
      Some(be(java.lang.Double.doubleToLongBits(2.5), 8)),
      Some(num),
      Some(be(days, 4)),
      Some(be(1000000L, 8)),
      Some("héllo".getBytes(StandardCharsets.UTF_8)),
      Some(arr),
      Some(Array[Byte](0x0a, 0x0b)))))
    val vs = changes.head.values
    assert(vs(0) === true)
    assert(vs(1) === (-5).toShort)
    assert(vs(2) === 123456)
    assert(vs(3) === -99L)
    assert(vs(4) === 2.5)
    assert(vs(5) === new java.math.BigDecimal("12345.678"))
    assert(vs(6) === java.sql.Date.valueOf("2024-03-15"))
    assert(vs(7) === java.sql.Timestamp.from(
      java.time.Instant.parse("2000-01-01T00:00:01Z")))
    assert(vs(8) === "héllo")
    assert(vs(9) === Seq(1, null, 3))
    assert(vs(10).asInstanceOf[Array[Byte]].toSeq === Seq[Byte](0x0a, 0x0b))
    // negative numeric
    val neg = st.onMessage(insert(oid, tupB(
      None, None, None, None, None, Some(negNum),
      None, None, None, None, None)))
    assert(neg.head.values(5) === new java.math.BigDecimal("-12345.678"))
  }

  test("streamed transactions: interleave, subxact abort, commit order") {
    val out = decode(Seq(
      rel,
      streamStart(10L, first = true),
      withXid(10L, insert(relOid, tup(Some("1"), Some("s1a")))),
      streamStop(),
      // a NON-streamed txn lands between txn 10's segments
      begin(500L, 99), insert(relOid, tup(Some("5"), Some("plain"))), commit(500L),
      // txn 20's first segment runs inside subxact 21
      streamStart(20L, first = true),
      withXid(21L, insert(relOid, tup(Some("2"), Some("sub")))),
      streamStop(),
      streamStart(10L, first = false),
      withXid(10L, insert(relOid, tup(Some("3"), Some("s1b")))),
      streamStop(),
      streamAbort(20L, 21L), // subxact abort drops row 2 only
      streamStart(20L, first = false),
      withXid(20L, insert(relOid, tup(Some("4"), Some("s2")))),
      streamStop(),
      streamCommit(10L, 600L),
      streamCommit(20L, 700L)))
      .select("pk", "val", "action", "txn_seq", "txn_stmt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._4, t._5))
    assert(out === Array(
      (5L, "plain", CdcMerge.ActionInsert, 500L, 1L),
      (1L, "s1a", CdcMerge.ActionInsert, 600L, 1L),
      (3L, "s1b", CdcMerge.ActionInsert, 600L, 2L),
      (4L, "s2", CdcMerge.ActionInsert, 700L, 1L)))
  }

  test("in-stream Relation buffers with its rows: replay uses the OLD entry") {
    // the streamed txn redefines the relation BETWEEN its own rows
    // (R(old) is the global registry here; the in-stream R renames the
    // oid away from the target): the commit-time replay must decode I1
    // against the registry as it stood BEFORE the in-stream R — an
    // eagerly-applied R would drop I1 along with I2
    val relRenamed = relation(relOid, "public", "elsewhere",
      ("pk", 20, -1), ("val", 1043, -1))
    val out = decode(Seq(
      rel,
      streamStart(50L, first = true),
      withXid(50L, insert(relOid, tup(Some("1"), Some("before-ddl")))),
      withXid(50L, relRenamed),
      withXid(50L, insert(relOid, tup(Some("2"), Some("after-ddl")))),
      streamStop(),
      streamCommit(50L, 800L)))
      .select("pk", "val").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out === Array((1L, "before-ddl")))
  }

  test("binary timestamp cells beyond ±292 years do not wrap") {
    // µs·1000 in one Long overflows for PG 'infinity'
    // (Long.MaxValue µs) — seconds and sub-second nanos must add
    // separately, like the timestamptz arm
    val inf = PgOutputDecoder.binaryValue(be(Long.MaxValue, 8),
      PgOutputDecoder.PgCol("ts", 1114, -1))
      .asInstanceOf[java.time.LocalDateTime]
    assert(inf.getYear > 200000) // far future, not a wrapped past
    val y2500 = java.time.LocalDateTime.of(2500, 6, 1, 12, 30, 15, 250000000)
    val us = java.time.temporal.ChronoUnit.MICROS.between(
      java.time.LocalDateTime.of(2000, 1, 1, 0, 0), y2500)
    assert(PgOutputDecoder.binaryValue(be(us, 8),
      PgOutputDecoder.PgCol("ts", 1114, -1)) === y2500)
  }

  test("commit-LSN watermark: an overlapping re-stream delivers nothing") {
    // txns 100 and 200 commit, then an overlap replays txn 100 with a
    // stale value before new txn 300 — the per-slot durable watermark
    // (reference C8, replication.go:746-752) must swallow the replay
    val out = decode(Seq(
      rel,
      begin(100L, 1), insert(relOid, tup(Some("1"), Some("fresh"))), commit(100L),
      begin(200L, 2), insert(relOid, tup(Some("2"), Some("b"))), commit(200L),
      begin(100L, 1), insert(relOid, tup(Some("1"), Some("stale"))), commit(100L),
      begin(300L, 3), insert(relOid, tup(Some("3"), Some("c"))), commit(300L)))
      .select("pk", "val", "txn_seq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._3)
    assert(out === Array((1L, "fresh", 100L), (2L, "b", 200L),
      (3L, "c", 300L)))
  }

  test("watermark skips a replayed STREAMED txn and survives the snapshot") {
    val st = new PgOutputDecoder.SlotState()
    def feed(s: PgOutputDecoder.SlotState, ms: Seq[Array[Byte]]) =
      ms.flatMap(s.onMessage)
    assert(feed(st, Seq(rel,
      streamStart(10L, first = true),
      withXid(10L, insert(relOid, tup(Some("1"), Some("x")))),
      streamStop(), streamCommit(10L, 500L))).size === 1)
    // replayed streamed txn at the same commit LSN: swallowed
    assert(feed(st, Seq(
      streamStart(10L, first = true),
      withXid(10L, insert(relOid, tup(Some("1"), Some("x")))),
      streamStop(), streamCommit(10L, 500L))).isEmpty)
    // non-streamed replay mid-txn across a snapshot boundary
    st.onMessage(begin(500L, 9)) // replay of committed LSN 500 begins
    val resumed = PgOutputDecoder.SlotState.restore(st.snapshot, false)
    assert(feed(resumed, Seq(
      insert(relOid, tup(Some("1"), Some("x"))), commit(500L))).isEmpty)
    // the next genuinely-new txn decodes normally
    assert(feed(resumed, Seq(
      begin(600L, 11), insert(relOid, tup(Some("5"), Some("new"))),
      commit(600L))).map(_.lsn) === Seq(600L))
  }

  test("streamed transaction abort discards the whole buffer") {
    val out = decode(Seq(
      rel,
      streamStart(30L, first = true),
      withXid(30L, insert(relOid, tup(Some("1"), Some("gone")))),
      withXid(30L, insert(relOid, tup(Some("2"), Some("gone2")))),
      streamStop(),
      streamAbort(30L, 30L),
      begin(900L, 1), insert(relOid, tup(Some("3"), Some("kept"))), commit(900L)))
      .select("pk", "val").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out === Array((3L, "kept")))
  }

  test("stateful decode resumes across a stream-segment boundary") {
    val src = tmpDir("pgout_stream_src")
    val ckpt = tmpDir("pgout_stream_ckpt")
    val schema = StructType(Seq(
      StructField("slot", StringType), StructField("off", LongType),
      StructField("payload", BinaryType)))
    def land(name: String, off0: Long, msgs: Seq[Array[Byte]]): Unit =
      msgs.zipWithIndex.map { case (m, i) => ("s1", off0 + i, m) }
        .toDF("slot", "off", "payload")
        .coalesce(1).write.parquet(src.resolve(name).toString)
    val outDir = tmpDir("pgout_stream_out")
    def startQuery() = {
      val events = spark.readStream.schema(schema).parquet(src.toString + "/*")
      PgOutputDecoder.decodeSlotStreamsStateful(
        events, "slot", "off", "payload", "public.t",
        StructType(Seq(StructField("pk", LongType), StructField("val", StringType))))
        // the memory sink can't recover from a checkpoint — the file
        // sink can, which is the point of this test
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .start()
    }
    def results() = spark.read
      .schema("pk long, val string, action int, txn_tag string, " +
        "txn_server binary, txn_group string, txn_seq long, txn_stmt long")
      .parquet(outDir.toString)
    // batch 1 ends mid-stream: segment open, nothing committed yet
    land("b0", 0, Seq(rel, streamStart(40L, first = true),
      withXid(40L, insert(relOid, tup(Some("1"), Some("a"))))))
    val q1 = startQuery()
    q1.processAllAvailable()
    assert(results().count() === 0)
    q1.stop() // kill mid-stream; buffered messages live in the checkpoint
    // batch 2 after restart: close the segment and commit
    land("b1", 100, Seq(streamStop(), streamCommit(40L, 800L)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val out = results()
      .select("pk", "val", "txn_seq", "txn_stmt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Array((1L, "a", 800L, 1L)))
  }

  test("stateful decode: null slot id keys its own group, no NPE") {
    val msgs = Seq(begin(100L, 1), rel,
      insert(relOid, tup(Some("1"), Some("a"))), commit(100L))
    val df = msgs.zipWithIndex
      .map { case (m, i) => (null.asInstanceOf[String], i.toLong, m) }
      .toDF("slot", "off", "payload")
    val out = PgOutputDecoder.decodeSlotStreamsStateful(df, "slot", "off",
      "payload", "public.t", StructType(Seq(
        StructField("pk", LongType), StructField("val", StringType))))
      .select("pk", "val").as[(Long, String)].collect()
    assert(out === Array((1L, "a")))
  }

  test("stateful decode: oversized micro-batch fails fast, not OOM") {
    val msgs = Seq(begin(100L, 1), rel,
      insert(relOid, tup(Some("1"), Some("x" * 200))), commit(100L))
    val df = msgs.zipWithIndex.map { case (m, i) => ("s1", i.toLong, m) }
      .toDF("slot", "off", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      PgOutputDecoder.decodeSlotStreamsStateful(df, "slot", "off",
        "payload", "public.t", StructType(Seq(
          StructField("pk", LongType), StructField("val", StringType))),
        maxBufferedBytes = 64L)
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).map(x => x +: causes(x.getCause)).getOrElse(Nil)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(
        _.contains("maxBufferedBytes"))))
  }
}
