package graft.streaming

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** PostgreSQL `pgoutput` logical-replication decode (reference C2/C3:
  * `/root/reference/pgserver/logrepl/replication.go:222-683` consumes
  * the stream, `/root/reference/pgserver/logrepl/decode.go:30-600`
  * decodes tuple text values per type OID) — re-expressed as a pure
  * byte-level decoder over the PUBLIC pgoutput message format, feeding
  * the engine's delta schema ([[CdcMerge]]).
  *
  * Message layout (first byte = type, all integers BIG-endian):
  *  - 'B' Begin: final LSN (8), commit ts µs-since-2000 (8), xid (4)
  *  - 'C' Commit: flags (1), commit LSN (8), end LSN (8), ts (8)
  *  - 'R' Relation: oid (4), namespace (cstr), name (cstr), replica
  *    identity (1), ncols (2), then per column: flags (1), name (cstr),
  *    type OID (4), type modifier (4)
  *  - 'I' Insert: oid (4), 'N', TupleData
  *  - 'U' Update: oid (4), optional ('K'|'O') + old TupleData, then
  *    'N' + new TupleData
  *  - 'D' Delete: oid (4), ('K'|'O') + TupleData
  *  - 'T' Truncate: nrels (4), options (1), oids (4 each)
  *  TupleData: ncols (2), per column a kind byte — 'n' NULL,
  *  'u' unchanged-TOAST, 't' text (len (4) + bytes), 'b' binary
  *  (len (4) + per-OID binary format bytes).
  *
  * Streamed in-progress transactions (protocol v2, publications with
  * `streaming=on` — the reference tracks the same envelope,
  * `replication.go:889-898`):
  *  - 'S' StreamStart: xid (4), first-segment flag (1)
  *  - 'E' StreamStop (no body)
  *  - 'c' StreamCommit: xid (4), flags (1), commit LSN (8), end LSN
  *    (8), ts (8)
  *  - 'A' StreamAbort: xid (4), subxid (4)
  *  Between 'S' and 'E' every data message carries an extra xid (4)
  *  right after the type byte. Data messages of a streamed txn are
  *  buffered (as raw bytes, keyed by the segment's toplevel xid, each
  *  tagged with its own carried xid) and replayed through the normal
  *  decode path at StreamCommit — so txn_seq becomes the commit LSN
  *  exactly as for non-streamed txns; StreamAbort(xid, subxid) drops
  *  the subtransaction's messages (the whole buffer when subxid ==
  *  xid). Relation messages inside a stream buffer WITH the rows and
  *  apply during the commit-time replay, so rows sent before an
  *  in-transaction schema change decode against the registry as it
  *  stood when they were sent.
  *
  * Transaction coordinates map onto the delta schema the same way the
  * reference's applier persists them: `txn_seq` = the Begin message's
  * final LSN (the stream's total order — the reference's stale-event
  * guard compares exactly this, `replication.go:746-752`), `txn_stmt` =
  * ordinal of the event within its transaction; tag/server/group stay
  * NULL (GTID-mode fields of the MySQL side).
  *
  * A replication slot is a serial stream, so decode state (the
  * in-stream Relation registry + current txn coords) lives per slot;
  * the Spark surface shuffles on the slot column and walks each slot's
  * messages in offset order within its partition — parallel across
  * slots/tables (how the reference scales too: one applier per
  * subscription), serial within one, with no driver involvement.
  */
object PgOutputDecoder {

  final case class PgCol(name: String, typeOid: Int, typeMod: Int)
  final case class Relation(oid: Int, namespace: String, name: String,
      cols: Seq[PgCol]) {
    def qualified: String = s"$namespace.$name"
  }

  /** One decoded change: delta-schema action + txn coords + row values
    * (key image for deletes; all-null values for truncate). */
  final case class Change(relation: String, action: Int, lsn: Long,
      stmt: Long, values: Seq[Any])

  // ------------------------------------------------------------------
  // byte-level parsing

  private def beUint(d: Array[Byte], p: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v = (v << 8) | (d(p + i) & 0xffL); i += 1 }
    v
  }

  private def cstring(d: Array[Byte], p: Int): (String, Int) = {
    var e = p
    while (d(e) != 0) e += 1
    (new String(d, p, e - p, StandardCharsets.UTF_8), e + 1)
  }

  /** TupleData at `p` → (values, next pos). An unchanged-TOAST cell
    * ('u') means PostgreSQL did NOT ship the column's value — decoding
    * it as null and merging would silently wipe the stored column, so
    * by default it is an error: CDC over TOASTed columns requires
    * `ALTER TABLE ... REPLICA IDENTITY FULL` upstream (the standard
    * CDC-tool requirement; the reference resolves 'u' against the
    * current row instead, which a stateless decoder cannot). */
  private def tuple(d: Array[Byte], p0: Int, rel: Relation,
      toastAsNull: Boolean): (Seq[Any], Int) = {
    val n = beUint(d, p0, 2).toInt
    var p = p0 + 2
    val out = (0 until n).map { i =>
      (d(p) & 0xff).toChar match {
        case 'n' => p += 1; null
        case 'u' =>
          if (!toastAsNull) throw new UnsupportedOperationException(
            s"unchanged-TOAST column ${rel.cols(i).name} in ${rel.qualified}: " +
              "set REPLICA IDENTITY FULL upstream (or opt into " +
              "toastAsNull=true to overwrite with null)")
          p += 1; null
        case 't' =>
          val len = beUint(d, p + 1, 4).toInt
          val s = new String(d, p + 5, len, StandardCharsets.UTF_8)
          p += 5 + len
          textValue(s, rel.cols(i))
        case 'b' =>
          val len = beUint(d, p + 1, 4).toInt
          val b = java.util.Arrays.copyOfRange(d, p + 5, p + 5 + len)
          p += 5 + len
          binaryValue(b, rel.cols(i))
        case k => throw new IllegalArgumentException(s"tuple kind '$k'")
      }
    }
    (out, p)
  }

  /** One buffered data message of a streamed transaction: the xid it
    * carried (a subtransaction's, possibly) + its bytes with the
    * stream xid prefix already stripped. */
  final case class PendingMsg(xid: Long, bytes: Array[Byte])
  /** A streamed transaction's buffered messages, keyed by the
    * StreamStart (toplevel) xid. */
  final case class StreamTxn(xid: Long, msgs: Seq[PendingMsg])

  /** Serializable snapshot of one slot's decode state — the in-stream
    * Relation registry, current txn coords, and any in-progress
    * streamed transactions' buffered messages. This is exactly what
    * must survive a micro-batch boundary for a connector that splits
    * files mid-transaction (or mid-stream); [[decodeSlotStreamsStateful]]
    * keeps one per slot in the streaming checkpoint. */
  final case class SlotSnapshot(rels: Seq[Relation], lsn: Long, stmt: Long,
      inStream: Boolean = false, streamXid: Long = -1L,
      pending: Seq[StreamTxn] = Nil, committed: Long = -1L)

  object SlotState {
    /** Rebuild a decoder from a checkpointed snapshot. */
    def restore(snap: SlotSnapshot, toastAsNull: Boolean): SlotState = {
      val st = new SlotState(toastAsNull)
      st.rels = snap.rels.map(r => r.oid -> r).toMap
      st.lsn = snap.lsn
      st.stmt = snap.stmt
      st.inStream = snap.inStream
      st.streamXid = snap.streamXid
      st.streamBufs = snap.pending
        .map(t => t.xid -> t.msgs.toVector).toMap
      st.committed = snap.committed
      // skipTxn is DERIVED: a replayed txn's Begin can end one
      // micro-batch with its rows in the next — in-flight coords at or
      // under the durable watermark mean the current txn was already
      // emitted (the watermark only advances at Commit, after which no
      // data message arrives before the next Begin resets this)
      st.skipTxn = snap.lsn >= 0 && snap.lsn <= snap.committed
      st
    }
  }

  /** Decoder state for one slot's serial stream. A stream SLICE handed
    * to a FRESH state must start at a transaction boundary and carry
    * its Relation messages (PostgreSQL re-sends both on every
    * START_REPLICATION, and the reference flushes on txn boundaries —
    * the same contract): a data message before any Begin fails loudly
    * below rather than decoding with orphaned txn coords. A state
    * [[SlotState.restore]]d from a [[SlotSnapshot]] carries both
    * across slices, so checkpointed streams have no such alignment
    * requirement. */
  final class SlotState(toastAsNull: Boolean = false) {
    private var rels = Map.empty[Int, Relation]
    private var lsn = -1L
    private var stmt = 0L
    private var inStream = false
    private var streamXid = -1L
    private var streamBufs = Map.empty[Long, Vector[PendingMsg]]
    /** Durable watermark (reference C8: `replication.go:746-752` drops
      * messages with LSN <= the last durably-written LSN): the highest
      * fully-emitted commit LSN. Transactions at or under it — an
      * overlapping re-stream, a reconnect replaying from an older
      * restart point — are skipped whole, advancing only at Commit. */
    private var committed = -1L
    private var skipTxn = false

    /** Checkpointable copy of the current decode state. */
    def snapshot: SlotSnapshot =
      SlotSnapshot(rels.valuesIterator.toSeq.sortBy(_.oid), lsn, stmt,
        inStream, streamXid,
        streamBufs.toSeq.sortBy(_._1).map { case (x, ms) => StreamTxn(x, ms) },
        committed)

    private def tup(d: Array[Byte], p: Int, rel: Relation): (Seq[Any], Int) =
      tuple(d, p, rel, toastAsNull)

    /** Parse one pgoutput message; emits zero or more [[Change]]s.
      * Handles the streamed-transaction envelope, then dispatches data
      * messages to [[dataMessage]]. */
    def onMessage(d: Array[Byte]): Seq[Change] = (d(0) & 0xff).toChar match {
      case 'S' => // StreamStart: xid, first-segment flag
        inStream = true
        streamXid = beUint(d, 1, 4)
        if (!streamBufs.contains(streamXid))
          streamBufs += streamXid -> Vector.empty
        Nil
      case 'E' => // StreamStop: segment ends; txn still in progress
        inStream = false; streamXid = -1L; Nil
      case 'c' => // StreamCommit: xid, flags, commit LSN, end LSN, ts
        val xid = beUint(d, 1, 4)
        val commitLsn = beUint(d, 6, 8)
        val msgs = streamBufs.getOrElse(xid, Vector.empty)
        streamBufs -= xid
        if (commitLsn <= committed) Nil // replayed streamed txn
        else {
          lsn = commitLsn; stmt = 0L
          val out = msgs.flatMap(m => dataMessage(m.bytes))
          committed = math.max(committed, commitLsn)
          out
        }
      case 'A' => // StreamAbort: xid, subxid
        val xid = beUint(d, 1, 4)
        val subxid = beUint(d, 5, 4)
        if (subxid == xid) streamBufs -= xid
        else streamBufs = streamBufs.updatedWith(xid)(
          _.map(_.filterNot(_.xid == subxid)))
        Nil
      case t if inStream && "RIUDTYM".indexOf(t) >= 0 =>
        // in-stream data message: strip the extra xid after the type
        val msgXid = beUint(d, 1, 4)
        val stripped = d(0) +: java.util.Arrays.copyOfRange(d, 5, d.length)
        (t: @unchecked) match {
          case 'Y' | 'M' => Nil
          case _ =>
            // 'R' buffers WITH the rows, not applied on arrival: an
            // in-progress txn can alter the table between its own rows
            // (R(old), I1, R(new), I2) and the commit-time replay must
            // decode I1 against the OLD registry entry; an aborted
            // subxact's R rolls back with its rows via the xid filter
            streamBufs = streamBufs.updated(streamXid,
              streamBufs.getOrElse(streamXid, Vector.empty) :+
                PendingMsg(msgXid, stripped))
            Nil
        }
      case _ => dataMessage(d)
    }

    /** Parse one NON-streamed (or replayed) data message. */
    private def dataMessage(d: Array[Byte]): Seq[Change] = (d(0) & 0xff).toChar match {
      case 'B' =>
        lsn = beUint(d, 1, 8); stmt = 0L
        skipTxn = lsn <= committed // replayed txn: emit nothing
        Nil
      case 'C' =>
        if (!skipTxn && lsn >= 0) committed = math.max(committed, lsn)
        skipTxn = false
        Nil
      case 'O' | 'Y' | 'M' => Nil // origin / type / message
      case 'R' =>
        val oid = beUint(d, 1, 4).toInt
        val (ns, p1) = cstring(d, 5)
        val (name, p2) = cstring(d, p1)
        val ncols = beUint(d, p2 + 1, 2).toInt // p2 = replica identity byte
        var p = p2 + 3
        val cols = (0 until ncols).map { _ =>
          val (cn, pn) = cstring(d, p + 1) // +1 skips the flags byte
          val c = PgCol(cn, beUint(d, pn, 4).toInt, beUint(d, pn + 4, 4).toInt)
          p = pn + 8
          c
        }
        rels += oid -> Relation(oid, ns, name, cols)
        Nil
      case 'I' =>
        val rel = rels(beUint(d, 1, 4).toInt)
        val (vs, _) = tup(d, 6, rel) // 5 = 'N' tag
        emit(rel, CdcMerge.ActionInsert, vs)
      case 'U' =>
        val rel = rels(beUint(d, 1, 4).toInt)
        (d(5) & 0xff).toChar match {
          case 'N' =>
            val (vs, _) = tup(d, 6, rel)
            emit(rel, CdcMerge.ActionUpdate, vs)
          case 'K' | 'O' =>
            // old image present: the key (or row) changed — the
            // reference applies this as delete(old) + insert(new)
            // (`delta/controller.go` update-with-key-change arm)
            val (old, pOld) = tup(d, 6, rel)
            val (nw, _) = tup(d, pOld + 1, rel)
            emit(rel, CdcMerge.ActionDelete, old) ++
              emit(rel, CdcMerge.ActionInsert, nw)
        }
      case 'D' =>
        val rel = rels(beUint(d, 1, 4).toInt)
        val (vs, _) = tup(d, 6, rel) // 5 = 'K'/'O' tag
        emit(rel, CdcMerge.ActionDelete, vs)
      case 'T' =>
        val nrels = beUint(d, 1, 4).toInt
        (0 until nrels).flatMap { i =>
          val rel = rels(beUint(d, 6 + i * 4, 4).toInt)
          emit(rel, CdcMerge.ActionTruncate,
            Seq.fill[Any](rel.cols.size)(null))
        }
      case t => throw new IllegalArgumentException(s"pgoutput message '$t'")
    }

    private def emit(rel: Relation, action: Int, vs: Seq[Any]): Seq[Change] = {
      if (lsn < 0) throw new IllegalStateException(
        s"data message for ${rel.qualified} before any Begin: the stream " +
          "slice does not start at a transaction boundary")
      if (skipTxn) return Nil // txn at/under the durable watermark
      stmt += 1
      Seq(Change(rel.qualified, action, lsn, stmt, vs))
    }
  }

  // ------------------------------------------------------------------
  // text-format value decode per type OID (decode.go:30-600 analog)

  private def textValue(s: String, c: PgCol): Any = c.typeOid match {
    case 16 => s == "t" // bool
    case 21 => s.toShort // int2
    case 23 => s.toInt // int4
    case 20 => s.toLong // int8
    case 26 => s.toLong // oid
    case 700 => s.toFloat // float4
    case 701 => s.toDouble // float8
    case 1700 => // numeric: typmod carries (precision<<16 | scale) + 4
      val bd = new java.math.BigDecimal(s)
      if (c.typeMod >= 4) bd.setScale((c.typeMod - 4) & 0xffff) else bd
    case 17 => // bytea hex form \xdeadbeef
      require(s.startsWith("\\x"), s"bytea: $s")
      s.drop(2).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    case 1082 => java.sql.Date.valueOf(java.time.LocalDate.parse(s)) // date
    case 1114 => // timestamp (no tz) → NTZ
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    case 1184 => // timestamptz: "... +00" offset form → instant
      val norm = s.replace(' ', 'T') + (if (s.takeRight(3).contains(':')) "" else ":00")
      java.sql.Timestamp.from(java.time.OffsetDateTime.parse(norm).toInstant)
    case 1007 => parseArray(s).map(e => if (e == null) null else e.toInt)
    case 1016 => parseArray(s).map(e => if (e == null) null else e.toLong)
    case 1021 => parseArray(s).map(e => if (e == null) null else e.toFloat)
    case 1022 => parseArray(s).map(e => if (e == null) null else e.toDouble)
    case 1009 | 1015 => parseArray(s) // _text / _varchar
    case _ => s // text/varchar/bpchar/name/uuid/json/jsonb/enum...
  }

  // ------------------------------------------------------------------
  // binary-format value decode per type OID (tuple kind 'b' — the
  // wire formats PostgreSQL's send functions emit; the reference
  // resolves them via pgtype, `replication.go:1100-1121`)

  private val PgEpochDate = java.time.LocalDate.of(2000, 1, 1)
  private val PgEpochSeconds = 946684800L // 2000-01-01T00:00:00Z

  private[streaming] def binaryValue(b: Array[Byte], c: PgCol): Any = c.typeOid match {
    case 16 => b(0) != 0 // bool
    case 21 => beUint(b, 0, 2).toShort // int2
    case 23 => beUint(b, 0, 4).toInt // int4
    case 20 => beUint(b, 0, 8) // int8
    case 26 => beUint(b, 0, 4) // oid
    case 700 => java.lang.Float.intBitsToFloat(beUint(b, 0, 4).toInt)
    case 701 => java.lang.Double.longBitsToDouble(beUint(b, 0, 8))
    case 1700 => binaryNumeric(b, c)
    case 17 => b // bytea: raw
    case 1082 => // date: signed days since 2000-01-01
      java.sql.Date.valueOf(PgEpochDate.plusDays(beUint(b, 0, 4).toInt))
    case 1114 => // timestamp: signed µs since 2000-01-01 → NTZ
      // seconds + sub-second nanos separately: µs·1000 in one Long
      // wraps for |ts| beyond ~292 years (incl. PG 'infinity')
      val us1114 = beUint(b, 0, 8)
      PgEpochDate.atStartOfDay
        .plusSeconds(Math.floorDiv(us1114, 1000000L))
        .plusNanos(Math.floorMod(us1114, 1000000L) * 1000L)
    case 1184 => // timestamptz: same µs, as a UTC instant
      val us = beUint(b, 0, 8)
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        PgEpochSeconds + Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L))
    case 1007 | 1016 | 1021 | 1022 | 1009 | 1015 => binaryArray(b)
    case _ => new String(b, StandardCharsets.UTF_8) // text family
  }

  /** PG binary numeric: ndigits (2), weight (2, signed, base-10000
    * exponent of the first digit), sign (2: 0x0000 +, 0x4000 −,
    * 0xC000 NaN → null), dscale (2), then base-10000 digits (2 BE
    * each). */
  private def binaryNumeric(b: Array[Byte], c: PgCol): Any = {
    val ndigits = beUint(b, 0, 2).toInt
    val weight = beUint(b, 2, 2).toShort.toInt
    val sign = beUint(b, 4, 2).toInt
    val dscale = beUint(b, 6, 2).toInt
    if (sign == 0xc000) return null // NaN has no BigDecimal form
    var coeff = java.math.BigInteger.ZERO
    val base = java.math.BigInteger.valueOf(10000L)
    var i = 0
    while (i < ndigits) {
      coeff = coeff.multiply(base)
        .add(java.math.BigInteger.valueOf(beUint(b, 8 + i * 2, 2)))
      i += 1
    }
    if (sign == 0x4000) coeff = coeff.negate()
    new java.math.BigDecimal(coeff)
      .scaleByPowerOfTen(4 * (weight - ndigits + 1))
      .setScale(dscale)
  }

  /** PG binary array: ndim (4), has-null flag (4), element OID (4),
    * then per dimension {size (4), lower bound (4)}, then elements as
    * len (4, −1 = NULL) + element bytes. Elements recurse through
    * [[binaryValue]], so the result matches the text path's shape. */
  private def binaryArray(b: Array[Byte]): Seq[Any] = {
    val ndim = beUint(b, 0, 4).toInt
    require(ndim <= 1, s"only 1-D arrays supported: ndim=$ndim")
    val elemOid = beUint(b, 8, 4).toInt
    if (ndim == 0) return Nil
    val n = beUint(b, 12, 4).toInt
    val elemCol = PgCol("elem", elemOid, -1)
    var p = 20
    (0 until n).map { _ =>
      val len = beUint(b, p, 4).toInt // -1 = NULL element
      if (len < 0) { p += 4; null }
      else {
        val v = binaryValue(java.util.Arrays.copyOfRange(b, p + 4, p + 4 + len), elemCol)
        p += 4 + len
        v
      }
    }
  }

  /** PG array literal: `{a,b,NULL,"c\"d"}` → elements (NULL → null). */
  private[streaming] def parseArray(s: String): Seq[String] = {
    require(s.startsWith("{") && s.endsWith("}"), s"array: $s")
    val body = s.substring(1, s.length - 1)
    if (body.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quoted = false; var wasQuoted = false
    var i = 0
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!wasQuoted && v == "NULL") null else v)
      cur.clear(); wasQuoted = false
    }
    while (i < body.length) {
      val ch = body.charAt(i)
      if (quoted) ch match {
        case '\\' => cur.append(body.charAt(i + 1)); i += 1
        case '"' => quoted = false
        case c => cur.append(c)
      } else ch match {
        case '"' => quoted = true; wasQuoted = true
        case ',' => flush()
        case c => cur.append(c)
      }
      i += 1
    }
    flush()
    out.result()
  }

  // ------------------------------------------------------------------
  // Spark surface

  /** Decode pgoutput message streams into the flattened delta schema
    * for one target relation (`"namespace.name"`), ready for
    * [[CdcMerge.condense]] + merge. `events` holds one row per message:
    * a slot id, a monotone offset within the slot (the WAL position the
    * connector read the message at), and the raw message bytes. Events
    * for other relations are dropped (the C10 filter happens here,
    * before any shuffle leaves the decode stage).
    */
  def decodeSlotStreams(events: DataFrame, slotCol: String, offsetCol: String,
      payloadCol: String, targetRelation: String,
      dataSchema: StructType, toastAsNull: Boolean = false): DataFrame = {
    decodePasses.incrementAndGet()
    val outSchema = StructType(dataSchema.fields ++ Seq(
      StructField("action", IntegerType),
      StructField("txn_tag", StringType),
      StructField("txn_server", BinaryType),
      StructField("txn_group", StringType),
      StructField("txn_seq", LongType),
      StructField("txn_stmt", LongType)))
    val slotIdx = events.columns.indexOf(slotCol)
    val payloadIdx = events.columns.indexOf(payloadCol)
    events
      .repartition(col(slotCol))
      .sortWithinPartitions(col(slotCol), col(offsetCol))
      .mapPartitions { it =>
        val states = scala.collection.mutable.Map.empty[Any, SlotState]
        it.flatMap { r =>
          val st = states.getOrElseUpdate(r.get(slotIdx), new SlotState(toastAsNull))
          st.onMessage(r.getAs[Array[Byte]](payloadIdx))
            .filter(_.relation == targetRelation)
            .map(c => Row.fromSeq(c.values ++
              Seq(c.action, null, null, null, c.lsn, c.stmt)))
        }
      }(Encoders.row(outSchema))
  }

  /** Streaming variant of [[decodeSlotStreams]] whose per-slot decode
    * state (Relation registry + txn coords) lives in the streaming
    * checkpoint via `flatMapGroupsWithState`, so a connector may split
    * a transaction — or separate a Relation message from the rows that
    * need it — across micro-batches (round-4 advice: the stateless
    * path requires every slice to start at a txn boundary).
    *
    * `offsetCol` must be a LongType WAL position, monotone within a
    * slot; one micro-batch's messages per slot are buffered and sorted
    * by it (micro-batch-sized, the same bound the stateless path's
    * sortWithinPartitions implies). Works identically on a batch frame
    * (state spans the single "batch").
    *
    * `maxBufferedBytes` bounds that per-slot buffer: an unthrottled
    * first batch after a long outage could otherwise be the entire
    * backlog in one executor's memory. Exceeding it fails fast with a
    * pointer at the connector's `maxFilesPerTrigger` rather than
    * OOM-ing the executor mid-sort. */
  def decodeSlotStreamsStateful(events: DataFrame, slotCol: String,
      offsetCol: String, payloadCol: String, targetRelation: String,
      dataSchema: StructType, toastAsNull: Boolean = false,
      maxBufferedBytes: Long = 1L << 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val outSchema = StructType(dataSchema.fields ++ Seq(
      StructField("action", IntegerType),
      StructField("txn_tag", StringType),
      StructField("txn_server", BinaryType),
      StructField("txn_group", StringType),
      StructField("txn_seq", LongType),
      StructField("txn_stmt", LongType)))
    SlotStreams.statefulDecode(events, slotCol, offsetCol, payloadCol,
      outSchema, maxBufferedBytes, "maxFilesPerTrigger/maxFramesPerTrigger",
      Encoders.product[SlotSnapshot]) { snap =>
      val st = snap.map(SlotState.restore(_, toastAsNull))
        .getOrElse(new SlotState(toastAsNull))
      (bytes => st.onMessage(bytes)
        .filter(_.relation == targetRelation)
        .map(c => Row.fromSeq(c.values ++
          Seq(c.action, null, null, null, c.lsn, c.stmt))),
        () => st.snapshot)
    }
  }

  /** Driver-side count of full message-decode passes launched — spec
    * observability ONLY ([[BinlogEventDecoder.decodePasses]]' pgoutput
    * twin): lets a test assert a multi-table subscription window
    * parsed its bytes ONCE. Not part of the API. */
  private[graft] val decodePasses =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** SINGLE-PASS multi-relation decode
    * ([[BinlogEventDecoder.decodeSlotStreamsMulti]]'s pgoutput twin):
    * ONE message-parse pass over the window, emitting `(relation, one
    * nullable per-relation struct, meta)` rows; the caller splits per
    * relation with a filter + struct projection over the (persisted)
    * result. A subscription publishing many tables therefore parses
    * the window's bytes once, where the per-table
    * [[decodeSlotStreams]] loop parsed them once PER TABLE. Output
    * schema: `relation` STRING, then `__t_<i>` struct per entry of
    * `schemasByRelation` (in order), then the meta columns; exactly
    * one struct is non-null per row (TRUNCATE rows carry an all-null
    * struct for their relation — same contract as the flat decode's
    * null data columns). */
  def decodeSlotStreamsMulti(events: DataFrame, slotCol: String,
      offsetCol: String, payloadCol: String,
      schemasByRelation: Seq[(String, StructType)],
      toastAsNull: Boolean = false): DataFrame = {
    decodePasses.incrementAndGet()
    val relIdx = schemasByRelation.map(_._1).zipWithIndex.toMap
    val outSchema = StructType(
      StructField("relation", StringType) +:
        (schemasByRelation.zipWithIndex.map { case ((_, sc), i) =>
          StructField(s"__t_$i", sc)
        } ++ Seq(
          StructField("action", IntegerType),
          StructField("txn_tag", StringType),
          StructField("txn_server", BinaryType),
          StructField("txn_group", StringType),
          StructField("txn_seq", LongType),
          StructField("txn_stmt", LongType))))
    val nRels = schemasByRelation.size
    val slotIdx = events.columns.indexOf(slotCol)
    val payloadIdx = events.columns.indexOf(payloadCol)
    events
      .repartition(col(slotCol))
      .sortWithinPartitions(col(slotCol), col(offsetCol))
      .mapPartitions { it =>
        val states = scala.collection.mutable.Map.empty[Any, SlotState]
        it.flatMap { r =>
          val st = states.getOrElseUpdate(r.get(slotIdx),
            new SlotState(toastAsNull))
          st.onMessage(r.getAs[Array[Byte]](payloadIdx))
            .flatMap { c =>
              relIdx.get(c.relation).map { i =>
                val structs = new Array[Any](nRels)
                structs(i) = Row.fromSeq(c.values)
                Row.fromSeq(c.relation +: (structs.toSeq ++
                  Seq(c.action, null, null, null, c.lsn, c.stmt)))
              }
            }
        }
      }(Encoders.row(outSchema))
  }
}
