package graft.streaming

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import BinlogRowDecoder._

/** Byte-level golden tests for the binary row-image decoder (reference
  * C3, `/root/reference/binlog/rbr.go` cell layouts +
  * `binlog_json_serialization.go` binary JSON), then the decoded stream
  * through condense + merge. Fixtures are hand-assembled bytes — the
  * decoder must reproduce the documented MySQL layouts exactly. */
class BinlogRowDecoderSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------------
  // test-local encoder (independent arithmetic; golden cells below are
  // hand-written where practical)

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  private def be(v: Long, n: Int): Array[Byte] =
    ((n - 1) to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def encVarchar(s: String, maxLen: Int): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    (if (maxLen > 255) le(b.length, 2) else Array(b.length.toByte)) ++ b
  }

  private def encDecimal(unscaled: Long, precision: Int, scale: Int): Array[Byte] = {
    // positive layout: partial leading group + base-1e9 groups, BE,
    // sign bit set on first byte; negative = all bytes inverted
    val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val neg = unscaled < 0
    val abs = math.abs(unscaled)
    val intg = precision - scale
    val intDigits = abs / math.pow(10, scale).toLong
    val fracDigits = abs % math.pow(10, scale).toLong
    val intg0 = intg / 9; val intg0x = intg - intg0 * 9
    val frac0 = scale / 9; val frac0x = scale - frac0 * 9
    var out = Array.empty[Byte]
    // leading partial then full integer groups (BE within the layout)
    var rest = intDigits
    val intGroups = (0 until intg0).map { _ =>
      val g = rest % 1000000000L; rest /= 1000000000L; g
    }.reverse
    out ++= (if (dig2bytes(intg0x) > 0) be(rest, dig2bytes(intg0x)) else Array.empty[Byte])
    intGroups.foreach(g => out ++= be(g, 4))
    var frest = fracDigits
    val fracTail = if (frac0x > 0) frest % math.pow(10, frac0x).toLong else 0L
    if (frac0x > 0) frest /= math.pow(10, frac0x).toLong
    val fracGroups = (0 until frac0).map { _ =>
      val g = frest % 1000000000L; frest /= 1000000000L; g
    }.reverse
    fracGroups.foreach(g => out ++= be(g, 4))
    if (dig2bytes(frac0x) > 0) out ++= be(fracTail, dig2bytes(frac0x))
    out(0) = (out(0) ^ 0x80).toByte
    if (neg) out = out.map(b => (~b).toByte)
    out
  }

  private def encJsonString(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    require(b.length <= 0x7f) // test strings are short
    Array(b.length.toByte) ++ b
  }

  /** Small-format object/array encoder for fixtures (count/size/offsets
    * in 2 bytes, offsets relative to payload start). */
  private def encJsonValue(v: Any): (Byte, Array[Byte]) = v match {
    case null => (0x04, Array(0x00.toByte))
    case b: Boolean => (0x04, Array(if (b) 0x01.toByte else 0x02.toByte))
    case i: Int => (0x05, le(i.toLong, 2))
    case l: Long => (0x09, le(l, 8))
    case d: Double => (0x0b, le(java.lang.Double.doubleToLongBits(d), 8))
    case s: String => (0x0c, encJsonString(s))
    case xs: Seq[_] =>
      var entries = Array.empty[Byte]; var values = Array.empty[Byte]
      var off = 2 + 2 + xs.length * 3
      xs.foreach { x =>
        val (t, enc) = encJsonValue(x)
        if (t == 0x04) entries ++= Array(t) ++ le(enc(0) & 0xffL, 2)
        else if (t == 0x05 || t == 0x06) entries ++= Array(t) ++ enc // inline int16
        else {
          entries ++= Array(t) ++ le(off.toLong, 2)
          values ++= enc; off += enc.length
        }
      }
      (0x02, le(xs.length.toLong, 2) ++ le(off.toLong, 2) ++ entries ++ values)
    case m: Map[_, _] =>
      val sorted = m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
      val n = sorted.length
      var keyEntries = Array.empty[Byte]; var keys = Array.empty[Byte]
      var off = 2 + 2 + n * 4 + n * 3
      sorted.foreach { case (k, _) =>
        val kb = k.getBytes("UTF-8")
        keyEntries ++= le(off.toLong, 2) ++ le(kb.length.toLong, 2)
        keys ++= kb; off += kb.length
      }
      var valEntries = Array.empty[Byte]; var values = Array.empty[Byte]
      sorted.foreach { case (_, x) =>
        val (t, enc) = encJsonValue(x)
        if (t == 0x04) valEntries ++= Array(t) ++ le(enc(0) & 0xffL, 2)
        else if (t == 0x05 || t == 0x06) valEntries ++= Array(t) ++ enc // inline int16
        else {
          valEntries ++= Array(t) ++ le(off.toLong, 2)
          values ++= enc; off += enc.length
        }
      }
      (0x00, le(n.toLong, 2) ++ le(off.toLong, 2) ++ keyEntries ++ valEntries ++ keys ++ values)
  }

  private def encJsonDoc(v: Any): Array[Byte] = {
    val (t, enc) = encJsonValue(v)
    Array(t) ++ enc
  }

  private def encRow(specs: Seq[ColSpec], values: Seq[Any]): Array[Byte] = {
    val bitmap = new Array[Byte]((specs.size + 7) / 8)
    values.zipWithIndex.foreach { case (v, i) =>
      if (v == null) bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
    }
    val cells = specs.zip(values).collect { case (spec, v) if v != null =>
      spec.tpe match {
        case TinyInt => Array(v.asInstanceOf[Number].byteValue())
        case ShortInt => le(v.asInstanceOf[Number].longValue(), 2)
        case Int24 => le(v.asInstanceOf[Number].longValue(), 3)
        case Int32 => le(v.asInstanceOf[Number].longValue(), 4)
        case Int64 => le(v.asInstanceOf[Number].longValue(), 8)
        case Float32 => le(java.lang.Float.floatToIntBits(
          v.asInstanceOf[Number].floatValue()) & 0xffffffffL, 4)
        case Float64 => le(java.lang.Double.doubleToLongBits(
          v.asInstanceOf[Number].doubleValue()), 8)
        case Date =>
          val d = v.asInstanceOf[java.time.LocalDate]
          le(d.getYear.toLong * 512 + d.getMonthValue * 32 + d.getDayOfMonth, 3)
        case Time2(0) => be(0x800000L + v.asInstanceOf[Long], 3) // whole-second fixtures
        case DateTime2(0) =>
          val t = v.asInstanceOf[java.time.LocalDateTime]
          val ym = t.getYear * 13 + t.getMonthValue
          val packed = (((ym.toLong * 32) + t.getDayOfMonth) << 17) |
            (t.getHour << 12) | (t.getMinute << 6) | t.getSecond
          be(0x8000000000L + packed, 5)
        case Timestamp2(0) => be(v.asInstanceOf[java.time.Instant].getEpochSecond, 4)
        case NewDecimal(p, s) => encDecimal(
          v.asInstanceOf[java.math.BigDecimal].unscaledValue().longValueExact(), p, s)
        case Varchar(max, _) => encVarchar(v.asInstanceOf[String], max)
        case Blob(lb) =>
          val b = v.asInstanceOf[Array[Byte]]; le(b.length.toLong, lb) ++ b
        case Json(lb) =>
          val b = encJsonDoc(v); le(b.length.toLong, lb) ++ b
        case Year =>
          val y = v.asInstanceOf[Number].intValue()
          Array((if (y == 0) 0 else y - 1900).toByte)
        case Bit(bits) => v match {
          case l: Long => be(l, (bits + 7) / 8)
          case b: Array[Byte] => b
        }
        case EnumT(vals) =>
          le(vals.indexOf(v.asInstanceOf[String]) + 1L,
            if (vals.size > 255) 2 else 1)
        case SetT(vals) =>
          val members = v.asInstanceOf[String].split(",").filter(_.nonEmpty).toSet
          val mask = vals.zipWithIndex.collect {
            case (m, i) if members(m) => 1L << i
          }.sum
          le(mask, (vals.size + 7) / 8)
        case other => fail(s"no test encoding for $other")
      }
    }
    bitmap ++ cells.flatten
  }

  // ----------------------------------------------------------------

  test("golden cells: hand-written bytes decode to exact values") {
    // INT32 123456789 little-endian
    assert(decodeCell(Array[Byte](0x15, 0xcd.toByte, 0x5b, 0x07), 0, Int32)
      === ((123456789, 4)))
    // VARCHAR 'héllo' (UTF-8, 1-byte length prefix)
    val hello = Array[Byte](6, 'h', 0xc3.toByte, 0xa9.toByte, 'l', 'l', 'o')
    assert(decodeCell(hello, 0, Varchar(50))._1 === "héllo")
    // DECIMAL(10,2) 12345678.90: int part 12345678 = 0x00BC614E with
    // sign bit → 80 BC 61 4E, frac 90 → 5A
    val dec = Array[Byte](0x80.toByte, 0xbc.toByte, 0x61, 0x4e, 0x5a)
    assert(decodeCell(dec, 0, NewDecimal(10, 2))._1
      === new java.math.BigDecimal("12345678.90"))
    // negative: all bytes inverted
    val negDec = dec.map(b => (~b).toByte)
    assert(decodeCell(negDec, 0, NewDecimal(10, 2))._1
      === new java.math.BigDecimal("-12345678.90"))
    // DATE 2024-03-15: 2024*512 + 3*32 + 15 = 1036399 = 0x0FD06F, LE
    assert(decodeCell(Array[Byte](0x6f, 0xd0.toByte, 0x0f), 0, Date)._1
      === java.sql.Date.valueOf("2024-03-15"))
    // zero dates (legal without NO_ZERO_DATE) decode to null, not throw
    assert(decodeCell(Array[Byte](0, 0, 0), 0, Date)._1 === null)
    // 2024-00-00 (zero month/day components)
    assert(decodeCell(le(2024L * 512, 3), 0, Date)._1 === null)
    // TIME 13:45:30 → (13<<12 | 45<<6 | 30) + 0x800000 = 0x80DB5E, BE
    assert(decodeCell(Array[Byte](0x80.toByte, 0xdb.toByte, 0x5e), 0, Time2(0))._1
      === (13 * 3600 + 45 * 60 + 30) * 1000000L)
    // BLOB, 2-byte length prefix
    val blob = Array[Byte](3, 0, 0x01, 0x02, 0x03)
    assert(decodeCell(blob, 0, Blob(2))._1
      .asInstanceOf[Array[Byte]].toSeq === Seq[Byte](1, 2, 3))
  }

  test("golden cells: YEAR / BIT / ENUM / SET arms") {
    // YEAR 2024 stored as 124 (year − 1900); 0 stays the zero year
    assert(decodeCell(Array[Byte](124), 0, Year)._1 === 2024.toShort)
    assert(decodeCell(Array[Byte](0), 0, Year)._1 === 0.toShort)
    assert(decodeCell(Array[Byte](1), 0, Year)._1 === 1901.toShort)
    // BIT(10) 0b10_1100_0101 = 0x2C5: two BIG-endian bytes
    assert(decodeCell(Array[Byte](0x02, 0xc5.toByte), 0, Bit(10)) === ((0x2c5L, 2)))
    // BIT(64) keeps raw bytes (an unsigned Long would flip sign)
    val b64 = Array[Byte](0xff.toByte, 0, 0, 0, 0, 0, 0, 1)
    assert(decodeCell(b64, 0, Bit(64))._1.asInstanceOf[Array[Byte]].toSeq
      === b64.toSeq)
    // ENUM: little-endian 1-based index; 0 = '' error value; the index
    // goes 2-byte once the list exceeds 255 members
    val colors = Seq("red", "green", "blue")
    assert(decodeCell(Array[Byte](2), 0, EnumT(colors))._1 === "green")
    assert(decodeCell(Array[Byte](0), 0, EnumT(colors))._1 === "")
    val many = (1 to 300).map(i => s"v$i")
    assert(decodeCell(le(300L, 2), 0, EnumT(many))._1 === "v300")
    // SET: little-endian bitmask, members comma-joined in decl order
    val days = Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")
    assert(decodeCell(Array[Byte]((1 | 4 | 64).toByte), 0, SetT(days))._1
      === "mon,wed,sun")
    assert(decodeCell(Array[Byte](0), 0, SetT(days))._1 === "")
    // a 9-member SET spans two bytes
    val nine = (1 to 9).map(i => s"m$i")
    assert(decodeCell(le(0x101L, 2), 0, SetT(nine))._1 === "m1,m9")
    // MySQL pack length has no 5/6/7-byte forms: 33+ members store as
    // 8 bytes (get_set_pack_length caps (n+7)/8 > 4 to 8); a 5-byte
    // read would shift every later column in the row
    val forty = (1 to 40).map(i => s"s$i")
    assert(decodeCell(le(1L | (1L << 39), 8), 0, SetT(forty)) === (("s1,s40", 8)))
    val thirty3 = (1 to 33).map(i => s"s$i")
    assert(decodeCell(le(1L << 32, 8), 0, SetT(thirty3)) === (("s33", 8)))
  }

  test("charset-declared text cells transcode to UTF-8 strings (A36)") {
    // latin1 'café': 63 61 66 E9 — é is one byte 0xE9 in ISO-8859-1
    val latin = Array[Byte](4, 'c', 'a', 'f', 0xe9.toByte)
    assert(decodeCell(latin, 0, Varchar(50, "latin1"))._1 === "café")
    // gbk '中' = 0xD6D0 (two bytes), via the TEXT/BLOB layout
    val gbk = Array[Byte](2, 0xd6.toByte, 0xd0.toByte)
    assert(decodeCell(gbk, 0, Text(1, "gbk"))._1 === "中")
    // ucs2 'AB' = 00 41 00 42 big-endian UTF-16
    val ucs2 = Array[Byte](4, 0, 0x41, 0, 0x42)
    assert(decodeCell(ucs2, 0, Varchar(50, "ucs2"))._1 === "AB")
    // utf8mb4 alias resolves to UTF-8
    val u8 = Array[Byte](2, 0xc3.toByte, 0xa9.toByte)
    assert(decodeCell(u8, 0, Varchar(50, "utf8mb4"))._1 === "é")
  }

  test("golden binary JSON: hand-written small array and object") {
    // [null, true]: small array, count=2, size=10, literal entries inline
    val arr = Array[Byte](0x02, 0x02, 0x00, 0x0a, 0x00,
      0x04, 0x00, 0x00, 0x04, 0x01, 0x00)
    assert(parseBinaryJson(arr) === "[null, true]")
    // {"a": 7}: small object, count=1, key entry (offset=11, len=1),
    // value entry carries the int16 INLINE (MySQL inlines any value
    // that fits the 2-byte slot -- never at an offset)
    val obj = Array[Byte](0x00, 0x01, 0x00, 0x0c, 0x00,
      0x0b, 0x00, 0x01, 0x00, // key entry: offset 11, length 1
      0x05, 0x07, 0x00, // value entry: int16 7 inline
      'a')
    assert(parseBinaryJson(obj) === "{\"a\": 7}")
    // [3, -2]: small array with both int16s inline
    val arr2 = Array[Byte](0x02, 0x02, 0x00, 0x0a, 0x00,
      0x05, 0x03, 0x00, 0x05, 0xfe.toByte, 0xff.toByte)
    assert(parseBinaryJson(arr2) === "[3, -2]")
  }

  test("negative TIME with fractional seconds borrows one second") {
    // -838:59:58.5 style case, small: -(1s + 0.5s) = -1.5s
    // encode: magnitude hms=2 is stored as biased -(2) with frac complement
    // stored frac byte for fsp=1: value 50 (0.5 = 5 tenths → '50' two digits)
    val hms = -2L + 0x800000L
    val bytes = be(hms, 3) ++ Array((0x100 - 50).toByte)
    assert(decodeCell(bytes, 0, Time2(1))._1 === -1500000L)
    // positive twin
    val pos = be(0x800000L + 1, 3) ++ Array(50.toByte)
    assert(decodeCell(pos, 0, Time2(1))._1 === 1500000L)
  }

  test("full row images decode through the delta schema, nulls included") {
    val specs = Seq(
      ColSpec("id", Int64), ColSpec("name", Varchar(300)),
      ColSpec("amount", NewDecimal(12, 2)), ColSpec("born", Date),
      ColSpec("at", DateTime2(0)), ColSpec("doc", Json(4)),
      ColSpec("raw", Blob(2)), ColSpec("score", Float64))
    val values = Seq(42L, "argénteo",
      new java.math.BigDecimal("-1234567890.12"),
      java.time.LocalDate.of(1999, 12, 31),
      java.time.LocalDateTime.of(2024, 3, 15, 13, 45, 30),
      Map("k" -> Seq(1, null, "x"), "n" -> 2.5),
      Array[Byte](9, 8, 7), 3.25)
    val decoded = decodeRow(encRow(specs, values), specs)
    assert(decoded(0) === 42L)
    assert(decoded(1) === "argénteo")
    assert(decoded(2) === new java.math.BigDecimal("-1234567890.12"))
    assert(decoded(3) === java.sql.Date.valueOf("1999-12-31"))
    assert(decoded(4) === java.time.LocalDateTime.of(2024, 3, 15, 13, 45, 30))
    assert(decoded(5) === "{\"k\": [1, null, \"x\"], \"n\": 2.5}")
    assert(decoded(6).asInstanceOf[Array[Byte]].toSeq === Seq[Byte](9, 8, 7))
    assert(decoded(7) === 3.25)
    // nulls flagged in the bitmap, cells absent
    val withNulls = Seq(7L, null, null, null, null, null, null, 1.5)
    val decoded2 = decodeRow(encRow(specs, withNulls), specs)
    assert(decoded2 === Seq(7L, null, null, null, null, null, null, 1.5))
  }

  test("binary events decode → condense → merge end-to-end") {
    val specs = Seq(ColSpec("id", Int64), ColSpec("name", Varchar(100)),
      ColSpec("amount", NewDecimal(10, 2)))
    val tableSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DecimalType(10, 2))))

    def ev(id: Long, name: String, amount: String, action: Int, seq: Long) =
      (encRow(specs, Seq(id, name,
        if (amount == null) null else new java.math.BigDecimal(amount))),
        action, 1L, seq, 0L)

    val events = Seq(
      ev(1L, "alpha", "10.00", 2, 1L),
      ev(2L, "beta", "20.00", 2, 2L),
      ev(1L, "alpha2", "11.50", 1, 3L), // update wins over insert
      ev(3L, "gamma", "30.00", 2, 4L),
      ev(2L, "beta", "20.00", 0, 5L)) // delete
      .toDF("payload", "action", "txn_group", "txn_seq", "txn_stmt")

    val decoded = BinlogRowDecoder.decodeBinaryEvents(events, "payload", specs)
    assert(decoded.schema.fieldNames.toSeq
      === Seq("id", "name", "amount", "action", "txn_group", "txn_seq", "txn_stmt"))

    val t = GraftTable.create(spark, tmpDir("graft_binlog"), tableSchema, Seq("id"))
    CdcMerge.applyBatch(t, decoded)
    val out = t.read().orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDecimal(2).toString))
      === Array((1L, "alpha2", "11.50"), (3L, "gamma", "30.00")))
  }

  test("alltypes replication analog: insert / update-to-null / delete") {
    // the reference's binlog_replication_alltypes_test.go:29-120 shape:
    // one row per supported column type flows through insert →
    // update-every-column-to-null → delete-the-other-row, ending in a
    // single all-null-but-pk row in the target table
    val colors = Seq("red", "green", "blue")
    val days = Seq("mon", "tue", "wed")
    val specs = Seq(
      ColSpec("id", Int64),
      ColSpec("t_tiny", TinyInt), ColSpec("t_short", ShortInt),
      ColSpec("t_i24", Int24), ColSpec("t_i32", Int32),
      ColSpec("t_f32", Float32), ColSpec("t_f64", Float64),
      ColSpec("t_year", Year), ColSpec("t_bit", Bit(10)),
      ColSpec("t_enum", EnumT(colors)), ColSpec("t_set", SetT(days)),
      ColSpec("t_date", Date), ColSpec("t_dt", DateTime2(0)),
      ColSpec("t_dec", NewDecimal(10, 2)), ColSpec("t_vc", Varchar(100)))
    val tableSchema = StructType(
      specs.map(s => StructField(s.name, s.tpe.sparkType)))
    val full: Seq[Any] = Seq(1L, 7.toByte, 300.toShort, 70000, 2000000000,
      1.5f, 2.25, 2024.toShort, 0x2c5L, "green", "mon,wed",
      java.time.LocalDate.of(2020, 6, 1),
      java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5),
      new java.math.BigDecimal("99.50"), "row-one")
    val allNull: Seq[Any] = 1L +: Seq.fill[Any](specs.size - 1)(null)

    def ev(vals: Seq[Any], action: Int, seq: Long) =
      (encRow(specs, vals), action, 1L, seq, 0L)
    val events = Seq(
      ev(full, 2, 1L),
      ev(full.updated(0, 2L), 2, 2L),
      ev(allNull, 1, 3L),
      ev(full.updated(0, 2L), 0, 4L))
      .toDF("payload", "action", "txn_group", "txn_seq", "txn_stmt")
    val decoded = BinlogRowDecoder.decodeBinaryEvents(events, "payload", specs)

    // the insert image round-trips every new type arm exactly
    val first = decoded.filter(col("txn_seq") === 1L).collect()(0)
    def at(n: String) = first.get(specs.indexWhere(_.name == n))
    assert(at("t_year") === 2024.toShort)
    assert(at("t_bit") === 0x2c5L)
    assert(at("t_enum") === "green")
    assert(at("t_set") === "mon,wed")

    val t = GraftTable.create(spark, tmpDir("graft_alltypes"), tableSchema, Seq("id"))
    CdcMerge.applyBatch(t, decoded)
    val out = t.read().collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L)
    (1 until specs.size).foreach(i =>
      assert(out(0).isNullAt(i), s"column ${specs(i).name} should be null"))
  }
}
