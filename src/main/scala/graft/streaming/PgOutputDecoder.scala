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
  *  'u' unchanged-TOAST, 't' text (len (4) + bytes).
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
        case k => throw new IllegalArgumentException(s"tuple kind '$k'")
      }
    }
    (out, p)
  }

  /** Serializable snapshot of one slot's decode state — the in-stream
    * Relation registry plus current txn coords. This is exactly what
    * must survive a micro-batch boundary for a connector that splits
    * files mid-transaction; [[decodeSlotStreamsStateful]] keeps one
    * per slot in the streaming checkpoint. */
  final case class SlotSnapshot(rels: Seq[Relation], lsn: Long, stmt: Long)

  object SlotState {
    /** Rebuild a decoder from a checkpointed snapshot. */
    def restore(snap: SlotSnapshot, toastAsNull: Boolean): SlotState = {
      val st = new SlotState(toastAsNull)
      st.rels = snap.rels.map(r => r.oid -> r).toMap
      st.lsn = snap.lsn
      st.stmt = snap.stmt
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

    /** Checkpointable copy of the current decode state. */
    def snapshot: SlotSnapshot =
      SlotSnapshot(rels.valuesIterator.toSeq.sortBy(_.oid), lsn, stmt)

    private def tup(d: Array[Byte], p: Int, rel: Relation): (Seq[Any], Int) =
      tuple(d, p, rel, toastAsNull)

    /** Parse one pgoutput message; emits zero or more [[Change]]s. */
    def onMessage(d: Array[Byte]): Seq[Change] = (d(0) & 0xff).toChar match {
      case 'B' =>
        lsn = beUint(d, 1, 8); stmt = 0L; Nil
      case 'C' | 'O' | 'Y' | 'M' => Nil // commit / origin / type / message
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
    val slotIdx = events.columns.indexOf(slotCol)
    val offsetIdx = events.columns.indexOf(offsetCol)
    val payloadIdx = events.columns.indexOf(payloadCol)
    events
      // String.valueOf: a null slot id must key the "null" group, not
      // NPE the decode task (round-5 advice)
      .groupByKey(r => String.valueOf(r.get(slotIdx)))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (slot: String, rows: Iterator[Row],
            state: org.apache.spark.sql.streaming.GroupState[SlotSnapshot]) =>
          val st = state.getOption
            .map(SlotState.restore(_, toastAsNull))
            .getOrElse(new SlotState(toastAsNull))
          // materialize BEFORE state.update: the output iterator is
          // consumed after this function returns
          val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
          var bufBytes = 0L
          rows.foreach { r =>
            bufBytes += r.getAs[Array[Byte]](payloadIdx).length + 32L
            if (bufBytes > maxBufferedBytes) throw new IllegalStateException(
              s"slot $slot: micro-batch exceeds maxBufferedBytes=" +
                s"$maxBufferedBytes while buffering for the offset sort — " +
                "throttle the source (e.g. maxFilesPerTrigger) or raise " +
                "the cap")
            buf += r
          }
          val out = buf.sortBy(_.getLong(offsetIdx)).iterator
            .flatMap(r => st.onMessage(r.getAs[Array[Byte]](payloadIdx)))
            .filter(_.relation == targetRelation)
            .map(c => Row.fromSeq(c.values ++
              Seq(c.action, null, null, null, c.lsn, c.stmt)))
            .toVector
          state.update(st.snapshot)
          out.iterator
      }(Encoders.product[SlotSnapshot], Encoders.row(outSchema))
  }
}
