package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Publisher-side pgoutput (protocol v1) message encoder — the local
  * analog of the PostgreSQL primary the reference subscribes to
  * (`/root/reference/pgserver/subscription_handler.go:15-383` consumes
  * this wire via its logrepl client; the formats are PostgreSQL's
  * public "Logical Replication Message Formats").
  *
  * The engine's subscription surface ([[graft.Engine.createSubscription]])
  * snapshots a source warehouse and then APPLIES pgoutput frames from a
  * framelog; this encoder is how a local publication writes those
  * frames — one whole transaction per [[txn]] call, each frame stamped
  * with a monotone LSN so [[FrameLog]] offsets are WAL positions. The
  * Relation message is re-emitted inside every transaction (legal —
  * relations may repeat; PostgreSQL itself re-sends them per session)
  * so a poll-based subscriber can decode any suffix of the log that
  * starts at a transaction boundary.
  *
  * Values are rendered in TEXT format as PostgreSQL's output functions
  * spell them (the exact inverse of [[PgOutputDecoder]]'s textValue):
  * booleans `t`/`f`, bytea `\x` hex, timestamps `YYYY-MM-DD HH:MM:SS`.
  */
object PgOutputEncoder {

  /** PG type OID for a Spark column type (text-format encode side). */
  def pgTypeOid(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ShortType => 21
    case IntegerType => 23
    case LongType => 20
    case FloatType => 700
    case DoubleType => 701
    case _: DecimalType => 1700
    case BinaryType => 17
    case DateType => 1082
    case TimestampNTZType => 1114
    case TimestampType => 1184
    case _ => 25 // text
  }

  /** numeric typmod = ((precision << 16) | scale) + 4 (PG convention;
    * the decoder recovers the scale from it). -1 for everything else. */
  def pgTypeMod(dt: DataType): Int = dt match {
    case d: DecimalType => ((d.precision << 16) | d.scale) + 4
    case _ => -1
  }

  private def be(n: Long, bytes: Int): Array[Byte] =
    (0 until bytes).map(i => ((n >> (8 * (bytes - 1 - i))) & 0xff).toByte)
      .toArray

  private def cstr(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  private def cat(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** `yyyy-MM-dd HH:mm:ss[.ffffff]+00` — how PG's output function
    * spells timestamptz (always with an offset; [[PgOutputDecoder]]'s
    * 1184 text branch requires one or OffsetDateTime.parse throws). */
  private def pgTimestamptz(i: java.time.Instant): String = {
    val odt = java.time.OffsetDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
    val base = "%04d-%02d-%02d %02d:%02d:%02d".format(
      odt.getYear, odt.getMonthValue, odt.getDayOfMonth,
      odt.getHour, odt.getMinute, odt.getSecond)
    val micros = odt.getNano / 1000
    val frac =
      if (micros == 0) ""
      else "." + "%06d".format(micros).reverse.dropWhile(_ == '0').reverse
    base + frac + "+00"
  }

  /** PostgreSQL text-output spelling of one cell (None = SQL NULL).
    * Spark hands TimestampType cells back as java.sql.Timestamp (or
    * Instant under the java8 API) — those are OID 1184 (timestamptz)
    * per [[pgTypeOid]] and MUST carry a PG-style `+00` offset; only
    * TimestampNTZType's LocalDateTime stays offset-less (OID 1114). */
  def textOf(v: Any): Option[String] = Option(v).map {
    case b: Boolean => if (b) "t" else "f"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case b: Array[Byte] => "\\x" + b.map("%02x".format(_)).mkString
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => pgTimestamptz(t.toInstant)
    case t: java.time.Instant => pgTimestamptz(t)
    case t: java.time.LocalDateTime => t.toString.replace('T', ' ')
    case x => x.toString
  }

  def begin(lsn: Long, xid: Long): Array[Byte] =
    cat(Seq(Array('B'.toByte), be(lsn, 8), be(0L, 8), be(xid, 4)))

  def commit(lsn: Long): Array[Byte] =
    cat(Seq(Array('C'.toByte, 0.toByte), be(lsn, 8), be(lsn + 1, 8),
      be(0L, 8)))

  def relation(oid: Int, ns: String, name: String,
      schema: StructType): Array[Byte] =
    cat(Seq(Array('R'.toByte), be(oid, 4), cstr(ns), cstr(name),
      Array('d'.toByte), be(schema.size, 2)) ++
      schema.fields.flatMap { f =>
        Seq(Array(0.toByte), cstr(f.name), be(pgTypeOid(f.dataType), 4),
          be(pgTypeMod(f.dataType).toLong & 0xffffffffL, 4))
      })

  /** TupleData, text cells. */
  def tuple(vals: Seq[Option[String]]): Array[Byte] =
    cat(Seq(be(vals.size, 2)) ++ vals.map {
      case Some(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        cat(Seq(Array('t'.toByte), be(b.length, 4), b))
      case None => Array('n'.toByte)
    })

  def insert(oid: Int, row: Seq[Option[String]]): Array[Byte] =
    cat(Seq(Array('I'.toByte), be(oid, 4), Array('N'.toByte), tuple(row)))

  def update(oid: Int, row: Seq[Option[String]]): Array[Byte] =
    cat(Seq(Array('U'.toByte), be(oid, 4), Array('N'.toByte), tuple(row)))

  /** DELETE with the key image in the 'K' (replica-identity) form. */
  def delete(oid: Int, key: Seq[Option[String]]): Array[Byte] =
    cat(Seq(Array('D'.toByte), be(oid, 4), Array('K'.toByte), tuple(key)))

  /** One change inside [[txn]]: action uses the engine's delta codes
    * (0=delete, 1=update, 2=insert — [[CdcMerge]]). For deletes, only
    * the key columns' positions carry values; others may be null. */
  final case class Change(action: Int, values: Seq[Any])

  /** Encode one whole transaction over ONE relation as framelog-ready
    * `(lsn, frame)` pairs: Begin, Relation (re-emitted per txn — see
    * class doc), the changes in order, Commit. `lsn0` must be greater
    * than every previously published LSN; the commit frame carries the
    * HIGHEST lsn of the txn, so `FrameLog.lastOffset` after append is
    * a transaction boundary — exactly the checkpoint discipline
    * subscriptions rely on. Returns the frames plus the next free lsn. */
  def txn(lsn0: Long, xid: Long, relOid: Int, ns: String, table: String,
      schema: StructType, changes: Seq[Change])
      : (Seq[(Long, Array[Byte])], Long) = {
    // every frame gets a DISTINCT monotone lsn stamp: the decoder
    // sorts by the framelog off, and a tie could reorder Begin past
    // the Relation/row frames it must precede
    var lsn = lsn0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    out += ((lsn, begin(lsn0 + changes.size + 2, xid)))
    lsn += 1
    out += ((lsn, relation(relOid, ns, table, schema)))
    changes.foreach { c =>
      lsn += 1
      val vals = c.values.map(textOf)
      val frame = c.action match {
        case CdcMerge.ActionDelete => delete(relOid, vals)
        case CdcMerge.ActionUpdate => update(relOid, vals)
        case _ => insert(relOid, vals)
      }
      out += ((lsn, frame))
    }
    lsn += 1
    out += ((lsn, commit(lsn)))
    (out.toSeq, lsn + 1)
  }

  /** [[txn]] from DataFrame rows: every row becomes one change with
    * the given action over the frame's full column order. */
  def txnOfRows(lsn0: Long, xid: Long, relOid: Int, ns: String,
      table: String, schema: StructType, action: Int, rows: Seq[Row])
      : (Seq[(Long, Array[Byte])], Long) =
    txn(lsn0, xid, relOid, ns, table, schema,
      rows.map(r => Change(action, r.toSeq)))
}
