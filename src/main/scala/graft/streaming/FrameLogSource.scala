package graft.streaming

import java.util
import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Append-only CDC frame log — the transport half of the reference's
  * live replication consumers (C1/C2): the reference tails the wire
  * protocols directly — slot consume + LSN feedback for pgoutput
  * (`/root/reference/pgserver/logrepl/replication.go:222-683`) and the
  * MySQL replica handshake/heartbeat for binlog
  * (`/root/reference/binlogreplication/binlog_replica_applier.go:108-482`).
  * A Spark cluster cannot hold one long-lived socket per executor
  * across micro-batches, so the Spark-native shape splits the
  * connector: a thin per-source daemon appends raw protocol frames to
  * a durable log (one file per slot on any Hadoop filesystem), and
  * THIS source tails that log as a `MicroBatchStream` with per-slot
  * byte offsets in the streaming checkpoint — Spark's own
  * offset/commit machinery replaces the reference's hand-rolled LSN
  * feedback loop, and [[PgOutputDecoder.decodeSlotStreamsStateful]] /
  * [[BinlogRowDecoder]] consume the frames unchanged.
  *
  * Log layout: `dir/<slot>.framelog`, each record
  * `[8-byte BE source offset][4-byte BE length][length frame bytes]`.
  * The source offset is the producer's position stamp (LSN / binlog
  * position), monotone within a slot; it surfaces as the `off` column
  * the decoders sort on. Frames are opaque bytes — pgoutput messages,
  * binlog events, anything downstream understands.
  *
  * Read guarantees:
  *  - a record is only served once its bytes are fully on disk (the
  *    driver advances the end offset over COMPLETE records only, so a
  *    torn tail write is invisible until finished);
  *  - offsets are byte positions per slot file — restart resumes
  *    mid-file, mid-transaction (decode state lives in the decoder's
  *    own checkpoint state, [[PgOutputDecoder.SlotSnapshot]]);
  *  - `maxFramesPerTrigger` bounds a micro-batch (admission control),
  *    the analog of the reference's 128 MB flush threshold;
  *  - new slot files appearing mid-stream are picked up on the next
  *    trigger at offset 0.
  *
  * Scale shape: one input partition per slot and micro-batch — a slot
  * is a serial stream (same reason the decoders shuffle on slot), so
  * parallelism comes from slot count, exactly like the reference's
  * one-applier-per-subscription model. The driver reads only the
  * 12-byte record headers to find batch boundaries; executors stream
  * the payload bytes.
  */
class FrameLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "framelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FrameLogTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("framelog: 'path' option required")),
      Option(properties.get("maxFramesPerTrigger")).map(_.toLong))
}

object FrameLog {
  /** One row per frame: the slot id, the producer's monotone position
    * stamp, the raw frame bytes — exactly the decoders' input shape. */
  val schema: StructType = StructType(Seq(
    StructField("slot", StringType, nullable = false),
    StructField("off", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val Suffix = ".framelog"
  private[streaming] val HeaderLen = 12 // 8-byte offset + 4-byte length

  /** Append frames to a slot's log (the test/connector producer; a
    * production daemon writes the same layout through its own FS
    * client). Local-FS only — Hadoop's file:// FS does not support
    * append, and the producer side of a real deployment runs outside
    * Spark anyway. */
  def append(dir: java.nio.file.Path, slot: String,
      frames: Seq[(Long, Array[Byte])]): Unit = {
    val f = dir.resolve(slot + Suffix)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(f,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)))
    try frames.foreach { case (off, bytes) =>
      out.writeLong(off); out.writeInt(bytes.length); out.write(bytes)
    } finally out.close()
  }

  /** One walk from byte `from` over complete records: returns the byte
    * position AFTER the last complete record and that record's position
    * stamp (None when no complete record lies past `from`). The single
    * walk keeps byte position and LSN consistent under concurrent
    * appends — computing them in two passes could disagree about the
    * tail and silently skip a frame (the subscription checkpoint
    * discipline, Engine.createSubscription/refreshSubscription). */
  def endState(dir: java.nio.file.Path, slot: String, from: Long)
      : (Long, Option[Long]) =
    walkEnd(dir, slot, from, pgAware = false)

  /** [[endState]] stopping at the last position that is a SAFE
    * pgoutput transaction cut — the subscription poll's window rule: a
    * publisher mid-append can leave a complete RECORD that is not a
    * complete TRANSACTION on disk, and a byte window frozen there
    * would hand the stateless decoder a Begin-less suffix on the NEXT
    * poll (a permanently wedged subscription). A cut is safe after a
    * Commit ('C') or StreamCommit ('c') frame ONLY when no PG14
    * streamed in-progress transaction is still open there — streamed
    * txns interleave with serialized ones ('S' chunks for xid B may
    * precede Commit(A), with StreamCommit(B) later), and cutting at
    * Commit(A) would discard B's buffered early chunks while advancing
    * past them. StreamStart ('S') opens its xid; StreamCommit ('c') /
    * StreamAbort ('A') close it. Returns the byte position after the
    * last safe cut and that record's position stamp. */
  def endAtPgCommit(dir: java.nio.file.Path, slot: String, from: Long)
      : (Long, Option[Long]) =
    walkEnd(dir, slot, from, pgAware = true)

  /** [[endState]] stopping at the last MySQL-binlog transaction
    * boundary — an XID event (type 16) or a committing QUERY event
    * (GTID-mode DDL commits with no XID). The replica apply's poll
    * window rule ([[graft.Engine.applyReplicaLog]]): the IO thread
    * appends frames as they arrive, so a window frozen mid-transaction
    * would hand the stateless decoder a GTID-less / TABLE_MAP-less
    * suffix on the NEXT poll — same discipline as [[endAtPgCommit]]. */
  def endAtMyCommit(dir: java.nio.file.Path, slot: String, from: Long)
      : (Long, Option[Long]) =
    walkEnd(dir, slot, from, pgAware = false, myAware = true)

  private def walkEnd(dir: java.nio.file.Path, slot: String, from: Long,
      pgAware: Boolean, myAware: Boolean = false): (Long, Option[Long]) = {
    val f = dir.resolve(slot + Suffix)
    if (!java.nio.file.Files.exists(f)) return (from, None)
    val ch = java.nio.channels.FileChannel.open(f,
      java.nio.file.StandardOpenOption.READ)
    try {
      val size = ch.size()
      val hdr = java.nio.ByteBuffer.allocate(HeaderLen)
      val pb = java.nio.ByteBuffer.allocate(9) // type + xid + (subxid for 'A')
      val openStreams = scala.collection.mutable.Set.empty[Long]
      var pos = from
      var last = Option.empty[Long]
      var lastPos = from
      var done = false
      // a short positional read anywhere = torn tail: stop the walk
      // gracefully (the record becomes visible once complete)
      def readFully(buf: java.nio.ByteBuffer, at: Long, n: Int): Boolean = {
        buf.clear(); buf.limit(n)
        var read = 0
        while (read < n) {
          val r = ch.read(buf, at + read)
          if (r < 0) return false
          read += r
        }
        buf.flip(); true
      }
      while (!done && pos + HeaderLen <= size) {
        if (!readFully(hdr, pos, HeaderLen)) done = true
        else {
          val off = hdr.getLong
          val len = hdr.getInt
          if (len < 0 || pos + HeaderLen + len > size) done = true // torn tail
          else {
            var hit = !pgAware && !myAware
            if (myAware && len >= 5) {
              // binlog v4 header: ts(4) type(1) ... — XID commits;
              // a committing QUERY (GTID-mode DDL) has no XID after it
              if (!readFully(pb, pos + HeaderLen, 5)) done = true
              else (pb.get(4) & 0xff) match {
                case 16 => hit = true
                case 2 =>
                  val fb = java.nio.ByteBuffer.allocate(len)
                  if (!readFully(fb, pos + HeaderLen, len)) done = true
                  else hit = BinlogEventDecoder.queryCommitsTxn(fb.array())
                case _ => ()
              }
            }
            if (pgAware && len > 0) {
              val want = math.min(9, len)
              if (!readFully(pb, pos + HeaderLen, want)) done = true
              else {
                val first = pb.get()
                def xid: Option[Long] =
                  if (want >= 5) Some(pb.getInt.toLong & 0xffffffffL)
                  else None
                first.toChar match {
                  case 'S' => xid.foreach(openStreams += _)
                  case 'A' =>
                    // StreamAbort carries (xid, subxid); only
                    // subxid == xid aborts the TOP-LEVEL stream —
                    // a subtransaction abort leaves it open (PG14
                    // protocol; a Commit mid-stream is NOT a safe cut)
                    val x = xid
                    val subxid: Option[Long] =
                      if (want >= 9) Some(pb.getInt.toLong & 0xffffffffL)
                      else None
                    if (subxid.isEmpty || subxid == x)
                      x.foreach(openStreams -= _)
                  case 'c' =>
                    xid.foreach(openStreams -= _)
                    hit = openStreams.isEmpty
                  case 'C' => hit = openStreams.isEmpty
                  case _ => ()
                }
              }
            }
            if (!done) {
              pos += HeaderLen + len
              if (hit) { last = Some(off); lastPos = pos }
            }
          }
        }
      }
      (lastPos, last)
    } finally ch.close()
  }

  /** Producer-restart resume point: the position stamp of the last
    * COMPLETE record in a slot's log (a torn tail is skipped, same
    * rule the reader uses). The log itself is the durable position
    * store — what was appended IS what was flushed. */
  def lastOffset(dir: java.nio.file.Path, slot: String): Option[Long] =
    endState(dir, slot, 0L)._2
}

private[streaming] class FrameLogTable(path: String, maxFrames: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"framelog($path)"
  override def schema(): StructType = FrameLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Batch reads accept per-slot byte windows: `range.<slot>` =
    // "<fromByte>:<toByte>" (record boundaries, e.g. from
    // FrameLog.endState). A ranged slot's partition covers exactly
    // that window with ZERO driver header-walk — a poll-based consumer
    // (Engine.refreshSubscription) reads O(new bytes) per poll instead
    // of re-walking the whole log as it grows. Keys arrive lowercased
    // (CaseInsensitiveStringMap), so slots match case-insensitively.
    val ranges = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val it = options.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey.toLowerCase
      if (k.startsWith("range.")) {
        val Array(from, to) = e.getValue.split(":", 2)
        ranges += k.substring("range.".length) -> (from.toLong, to.toLong)
      }
    }
    val r = ranges.toMap
    new ScanBuilder {
      override def build(): Scan = new FrameLogScan(path, maxFrames, r)
    }
  }
}

private[streaming] class FrameLogScan(path: String, maxFrames: Option[Long],
    ranges: Map[String, (Long, Long)] = Map.empty)
    extends Scan {
  private val conf = new SerializableHadoopConf(
    SparkSession.active.sessionState.newHadoopConf())
  override def readSchema(): StructType = FrameLog.schema
  override def description(): String = s"FrameLog [$path]"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FrameLogMicroBatchStream(path, maxFrames, conf)
  override def toBatch: Batch = new Batch {
    // batch mode = everything currently complete in the log (replay /
    // backfill path; streaming is the primary surface). With any
    // `range.<slot>` option present, the read becomes a WINDOW read:
    // only the ranged slots are scanned, each exactly over its byte
    // window, with zero driver header-walk — other slots don't even
    // open (the poll-consumer shape, Engine.refreshSubscription).
    override def planInputPartitions(): Array[InputPartition] = {
      val walker = new FrameLogWalker(path, conf.value)
      val slots = walker.slotFiles().toSeq.sortBy(_._1)
      val picked =
        if (ranges.isEmpty) slots.map { case (slot, p) =>
          (slot, p, 0L, walker.walk(p, 0L, Long.MaxValue, None)._1)
        }
        else slots.flatMap { case (slot, p) =>
          ranges.get(slot.toLowerCase).map { case (from, to) =>
            (slot, p, from, to)
          }
        }
      picked.map { case (slot, p, start, end) =>
        FrameLogPartition(slot, p.toString, start, end): InputPartition
      }.filter { ip =>
        val fp = ip.asInstanceOf[FrameLogPartition]
        fp.endPos > fp.startPos
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new FrameLogReaderFactory(conf)
  }
}

/** Driver-side log metadata walker: lists slot files and advances over
  * complete records by reading only the 12-byte headers. */
private[streaming] class FrameLogWalker(dir: String, conf: Configuration) {
  private val dirPath = new HPath(dir)
  private val fs: FileSystem = dirPath.getFileSystem(conf)

  def slotFiles(): Map[String, HPath] =
    if (!fs.exists(dirPath)) Map.empty
    else fs.listStatus(dirPath).iterator
      .filter(s => s.isFile && s.getPath.getName.endsWith(FrameLog.Suffix))
      .map(s => s.getPath.getName.stripSuffix(FrameLog.Suffix) -> s.getPath)
      .toMap

  /** Walk complete records from byte `from`, consuming at most
    * `budget` frames, never past `hardEnd` (the AvailableNow target).
    * Returns (new end position, frames consumed). */
  def walk(p: HPath, from: Long, budget: Long,
      hardEnd: Option[Long]): (Long, Long) = {
    val fileLen = fs.getFileStatus(p).getLen
    val limit = hardEnd.fold(fileLen)(math.min(_, fileLen))
    if (from >= limit || budget <= 0) return (from, 0L)
    val in = fs.open(p)
    try {
      val hdr = new Array[Byte](FrameLog.HeaderLen)
      var pos = from
      var n = 0L
      var done = false
      while (!done && n < budget && pos + FrameLog.HeaderLen <= limit) {
        in.readFully(pos, hdr)
        val len = ((hdr(8) & 0xff) << 24) | ((hdr(9) & 0xff) << 16) |
          ((hdr(10) & 0xff) << 8) | (hdr(11) & 0xff)
        if (len < 0 || pos + FrameLog.HeaderLen + len > limit) done = true
        else { pos += FrameLog.HeaderLen + len; n += 1 }
      }
      (pos, n)
    } finally in.close()
  }
}

private[streaming] class FrameLogMicroBatchStream(dir: String,
    maxFrames: Option[Long], conf: SerializableHadoopConf)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val walker = new FrameLogWalker(dir, conf.value)
  // rotates the fair-admission start slot across triggers (driver-side;
  // resets on restart, which only re-phases the rotation)
  private var rotation = 0
  // AvailableNow contract: batches stop once offsets reach the log
  // end captured at query start — appends during the run wait for the
  // next start (Spark calls prepare once per run, incl. after restart)
  private var availableNowTarget: Option[Map[String, Long]] = None

  override def getDefaultReadLimit: ReadLimit =
    maxFrames.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = FrameLogOffset(Map.empty)

  override def deserializeOffset(json: String): Offset =
    FrameLogOffset.fromJson(json)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(walker.slotFiles().map { case (slot, p) =>
      slot -> walker.walk(p, 0L, Long.MaxValue, None)._1
    })

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "framelog implements SupportsAdmissionControl; use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startPos = FrameLogOffset.positions(start)
    val total = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    val out = mutable.Map.empty[String, Long] ++ startPos // keep gone slots
    val sorted = walker.slotFiles().toSeq.sortBy(_._1)
    // Fair admission: a per-slot share FIRST (granting the whole budget
    // in sorted slot order would let one hot early-sorted slot starve
    // every later slot indefinitely), visiting slots at a ROTATING
    // start position (with budget < slot count the integer share floors
    // at 1 and only the first `budget` slots visited can win — rotation
    // moves that window every trigger), then a second pass hands idle
    // slots' unused share to whoever still has backlog (skipping slots
    // pass 1 already proved drained — each walk is an FS RPC).
    val slots =
      if (sorted.isEmpty) sorted
      else sorted.drop(rotation % sorted.size) ++ sorted.take(rotation % sorted.size)
    rotation += 1
    def capFor(slot: String, from: Long): Option[Long] =
      availableNowTarget.map(_.getOrElse(slot, from))
    var budget = total
    val share =
      if (total == Long.MaxValue || slots.isEmpty) Long.MaxValue
      else math.max(1L, total / slots.size)
    val drained = mutable.Set.empty[String]
    slots.foreach { case (slot, p) =>
      val from = startPos.getOrElse(slot, 0L)
      val granted = math.min(share, budget)
      val (end, n) = walker.walk(p, from, granted, capFor(slot, from))
      budget -= n
      out(slot) = end
      if (n < granted) drained += slot
    }
    if (budget > 0 && share != Long.MaxValue)
      slots.foreach { case (slot, p) =>
        if (budget > 0 && !drained.contains(slot)) {
          val from = out(slot)
          val (end, n) = walker.walk(p, from, budget, capFor(slot, from))
          budget -= n
          out(slot) = end
        }
      }
    FrameLogOffset(out.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = FrameLogOffset.positions(start)
    val e = FrameLogOffset.positions(end)
    val files = walker.slotFiles()
    e.toSeq.sortBy(_._1).flatMap { case (slot, endPos) =>
      val startPos = s.getOrElse(slot, 0L)
      files.get(slot).filter(_ => endPos > startPos)
        .map(p => FrameLogPartition(slot, p.toString, startPos, endPos): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameLogReaderFactory(conf)

  override def commit(end: Offset): Unit = () // retention is the producer's
  override def stop(): Unit = ()
}

private[streaming] case class FrameLogOffset(positions: Map[String, Long])
    extends Offset {
  override def json(): String = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization.write(positions)
  }
}

private[streaming] object FrameLogOffset {
  def fromJson(json: String): FrameLogOffset = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    FrameLogOffset(org.json4s.jackson.JsonMethods.parse(json)
      .extract[Map[String, Long]])
  }
  def positions(o: Offset): Map[String, Long] = o match {
    case FrameLogOffset(p) => p
    case other => fromJson(other.json()).positions
  }
}

/** One slot's byte range for one micro-batch — a serial stream slice,
  * so exactly one reader task per slot per batch. */
private[streaming] case class FrameLogPartition(slot: String, file: String,
    startPos: Long, endPos: Long) extends InputPartition

private[streaming] class FrameLogReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FrameLogPartition]
    new PartitionReader[InternalRow] {
      private val path = new HPath(p.file)
      private val in = path.getFileSystem(conf.value).open(path)
      private var pos = p.startPos
      private var row: InternalRow = _
      in.seek(p.startPos)

      override def next(): Boolean = {
        if (pos + FrameLog.HeaderLen > p.endPos) return false
        val off = in.readLong()
        val len = in.readInt()
        require(len >= 0 && pos + FrameLog.HeaderLen + len <= p.endPos,
          s"framelog ${p.file}: torn record at byte $pos inside a " +
            "committed range — log corrupted or rewritten in place")
        val payload = new Array[Byte](len)
        in.readFully(payload)
        pos += FrameLog.HeaderLen + len
        row = new GenericInternalRow(
          Array[Any](UTF8String.fromString(p.slot), off, payload))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

/** Minimal serializable Hadoop `Configuration` carrier (the shipping
  * pattern every DSv2 file source uses): the conf rides to executors
  * via Hadoop's own writable serialization. */
private[streaming] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
