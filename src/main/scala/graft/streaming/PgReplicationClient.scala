package graft.streaming

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets

/** PostgreSQL logical-replication client daemon — the producer half of
  * the C2 connector (reference: the replicator opens the socket itself,
  * consumes the slot, and feeds LSN standby-status back,
  * `/root/reference/pgserver/logrepl/replication.go:222-683`). This
  * client speaks the PUBLIC wire protocol v3 replication sub-protocol:
  *
  *   StartupMessage(replication=database) → AuthenticationOk →
  *   ReadyForQuery → `START_REPLICATION SLOT <slot> LOGICAL <lsn>
  *   (proto_version '1', publication_names '<pub>')` →
  *   CopyBothResponse → XLogData ('w') / PrimaryKeepalive ('k') in,
  *   StandbyStatusUpdate ('r') out.
  *
  * Every XLogData payload (one pgoutput message) is appended to
  * `dir/<slot>.framelog` stamped with its WAL start LSN — exactly the
  * `(off, payload)` shape [[FrameLogSource]] serves and
  * [[PgOutputDecoder]] consumes. The framelog IS the durable position
  * store: on (re)connect the client resumes from the last complete
  * record's LSN + 1 ([[FrameLog.lastOffset]]), and the flush position
  * in status updates is the last APPENDED-AND-FLUSHED LSN + 1 — the
  * reference reports `lastWrittenLSN + 1` the same way. Reconnects
  * retry with backoff up to `maxRetries` consecutive failures, exactly
  * the reference's `handleErrWithRetry` loop.
  *
  * Thin by design: no Spark dependency, one thread, blocking IO — the
  * cluster-side consumer is [[FrameLogSource]]; this daemon runs next
  * to the primary (or anywhere with a socket to it). */
final class PgReplicationClient(
    host: String,
    port: Int,
    user: String,
    database: String,
    slot: String,
    publication: String,
    dir: java.nio.file.Path,
    password: Option[String] = None,
    statusIntervalMs: Long = 10000L,
    reconnectBackoffMs: Long = 200L,
    maxRetries: Int = 5,
    connectTimeoutMs: Int = 4000) {

  @volatile private var stopped = false
  @volatile private var socket: Socket = _
  @volatile var lastError: Option[Throwable] = None
  // observable progress (specs poll these; production metrics hooks)
  @volatile var framesAppended: Long = 0L
  @volatile var statusUpdatesSent: Long = 0L
  @volatile var reconnects: Long = 0L

  private var thread: Thread = _

  def start(): PgReplicationClient = {
    thread = new Thread(() => run(), s"pg-repl-$slot")
    thread.setDaemon(true)
    thread.start()
    this
  }

  def stop(): Unit = {
    stopped = true
    Option(socket).foreach(s => try s.close() catch { case _: IOException => () })
    Option(thread).foreach(_.join(10000))
  }

  def isRunning: Boolean = Option(thread).exists(_.isAlive)

  /** Blocking connect-stream-reconnect loop. */
  def run(): Unit = {
    var failures = 0
    while (!stopped && failures <= maxRetries) {
      try {
        streamOnce()
        failures = 0
        if (!stopped) { reconnects += 1; sleep(reconnectBackoffMs) }
      } catch {
        case _: Throwable if stopped => () // closing the socket unblocks reads
        case e: Throwable =>
          lastError = Some(e)
          failures += 1
          if (!stopped && failures <= maxRetries) {
            reconnects += 1
            sleep(reconnectBackoffMs * failures) // linear backoff
          }
      }
    }
  }

  private def sleep(ms: Long): Unit =
    try Thread.sleep(ms) catch { case _: InterruptedException => () }

  // --------------------------------------------------------------
  // one connection's lifetime

  private def streamOnce(): Unit = {
    val s = new Socket()
    socket = s
    s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    // short read timeouts keep the status-update clock ticking while
    // the stream is idle
    s.setSoTimeout(math.min(statusIntervalMs, 250L).toInt)
    val in = new DataInputStream(s.getInputStream)
    val out = new DataOutputStream(s.getOutputStream)
    val log = new FrameAppender(dir, slot)
    try {
      startup(in, out)
      // resume AFTER the last durably-appended record — the log is the
      // position store (a crash between append and server confirm only
      // makes the server re-send entries we skip by asking past them)
      var lastFlushed = FrameLog.lastOffset(dir, slot).getOrElse(0L)
      var lastReceived = lastFlushed
      sendQuery(out,
        s"""START_REPLICATION SLOT "$slot" LOGICAL ${lsnText(lastFlushed + 1)} """ +
          s"(proto_version '1', publication_names '$publication')")
      expectCopyBoth(in)
      var nextStatusAt = System.currentTimeMillis() + statusIntervalMs
      def sendStatus(): Unit = {
        log.flush()
        val now = System.currentTimeMillis()
        val body = new java.io.ByteArrayOutputStream()
        val b = new DataOutputStream(body)
        b.writeByte('r')
        b.writeLong(lastReceived + 1) // write position
        b.writeLong(lastFlushed + 1) // flush position: durably appended
        b.writeLong(lastFlushed + 1) // apply position
        b.writeLong((now - 946684800000L) * 1000L) // PG epoch micros
        b.writeByte(0)
        sendMessage(out, 'd', body.toByteArray)
        statusUpdatesSent += 1
        nextStatusAt = now + statusIntervalMs
      }
      while (!stopped) {
        readMessage(in) match {
          case None => // idle timeout tick
          case Some(('E', body)) =>
            throw new IOException(s"server error: ${errorText(body)}")
          case Some(('d', body)) =>
            body(0) match {
              case 'w' =>
                // XLogData: walStart(8) walEnd(8) serverTime(8) payload
                val walStart = beLong(body, 1)
                val payload =
                  java.util.Arrays.copyOfRange(body, 25, body.length)
                log.append(walStart, payload)
                framesAppended += 1
                lastReceived = math.max(lastReceived, walStart)
                lastFlushed = math.max(lastFlushed, walStart)
              case 'k' =>
                // keepalive: serverWalEnd(8) serverTime(8) replyRequested(1)
                lastReceived = math.max(lastReceived, beLong(body, 1))
                if (body(17) != 0) sendStatus()
              case _ => () // forward-compatible skip
            }
          case Some(_) => () // ParameterStatus / NoticeResponse / ...
        }
        if (System.currentTimeMillis() >= nextStatusAt && lastReceived > 0)
          sendStatus()
      }
    } finally {
      log.close()
      try s.close() catch { case _: IOException => () }
    }
  }

  // --------------------------------------------------------------
  // protocol v3 plumbing (public format: type byte + int32 len + body;
  // the startup message alone has no type byte)

  private def startup(in: DataInputStream, out: DataOutputStream): Unit = {
    val params = Seq("user" -> user, "database" -> database,
      "replication" -> "database", "application_name" -> s"graft-$slot")
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(196608) // protocol 3.0
    params.foreach { case (k, v) =>
      b.write(cstr(k)); b.write(cstr(v))
    }
    b.writeByte(0)
    out.writeInt(4 + body.size())
    out.write(body.toByteArray)
    out.flush()
    // consume until ReadyForQuery, answering authentication
    var ready = false
    while (!ready) {
      readMessage(in) match {
        case None => ()
        case Some(('R', body)) =>
          beInt(body, 0) match {
            case 0 => () // AuthenticationOk
            case 3 => // cleartext password
              sendMessage(out, 'p', cstr(password.getOrElse("")))
            case other => throw new IOException(
              s"unsupported authentication request $other (trust or " +
                "cleartext password only)")
          }
        case Some(('E', body)) =>
          throw new IOException(s"startup failed: ${errorText(body)}")
        case Some(('Z', _)) => ready = true
        case Some(_) => () // ParameterStatus / BackendKeyData
      }
    }
  }

  private def sendQuery(out: DataOutputStream, sql: String): Unit =
    sendMessage(out, 'Q', cstr(sql))

  private def expectCopyBoth(in: DataInputStream): Unit = {
    while (true) {
      readMessage(in) match {
        case None => ()
        case Some(('W', _)) => return // CopyBothResponse
        case Some(('E', body)) =>
          throw new IOException(s"START_REPLICATION failed: ${errorText(body)}")
        case Some(_) => ()
      }
    }
  }

  private def sendMessage(out: DataOutputStream, tpe: Char,
      body: Array[Byte]): Unit = out.synchronized {
    out.writeByte(tpe)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  /** One backend message, or None on an idle-timeout tick. */
  private def readMessage(in: DataInputStream): Option[(Char, Array[Byte])] = {
    val tpe =
      try in.readByte()
      catch {
        case _: SocketTimeoutException => return None
        case _: EOFException => throw new IOException("server closed connection")
      }
    // the length is committed once the type byte arrived: finish the read
    // even across timeout ticks
    val len = blockingInt(in)
    val body = new Array[Byte](len - 4)
    blockingFully(in, body)
    Some((tpe.toChar, body))
  }

  private def blockingInt(in: DataInputStream): Int = {
    val b = new Array[Byte](4)
    blockingFully(in, b)
    beInt(b, 0)
  }

  private def blockingFully(in: DataInputStream, buf: Array[Byte]): Unit = {
    var done = 0
    while (done < buf.length) {
      try {
        val n = in.read(buf, done, buf.length - done)
        if (n < 0) throw new IOException("server closed connection mid-message")
        done += n
      } catch { case _: SocketTimeoutException => () } // keep reading
    }
  }

  private def cstr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    java.util.Arrays.copyOf(b, b.length + 1)
  }

  private def beInt(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xff) << 24) | ((d(p + 1) & 0xff) << 16) |
      ((d(p + 2) & 0xff) << 8) | (d(p + 3) & 0xff)

  private def beLong(d: Array[Byte], p: Int): Long =
    ((beInt(d, p) & 0xffffffffL) << 32) | (beInt(d, p + 4) & 0xffffffffL)

  private def lsnText(lsn: Long): String =
    f"${(lsn >>> 32).toInt}%X/${lsn.toInt}%X"

  private def errorText(body: Array[Byte]): String = {
    // ErrorResponse: (field-type byte, cstring) pairs until a 0 byte
    val sb = new StringBuilder
    var p = 0
    while (p < body.length && body(p) != 0) {
      val f = body(p).toChar
      val end = body.indexOf(0.toByte, p + 1)
      if (f == 'M' || f == 'S')
        sb.append(new String(body, p + 1, end - p - 1, StandardCharsets.UTF_8))
          .append(' ')
      p = end + 1
    }
    sb.toString.trim
  }
}

/** Buffered framelog appender held open for a connection's lifetime —
  * `flush()` before every status update makes "reported flushed" mean
  * "bytes on disk". */
private[streaming] final class FrameAppender(dir: java.nio.file.Path,
    slot: String) {
  private val out = new DataOutputStream(new java.io.BufferedOutputStream(
    java.nio.file.Files.newOutputStream(dir.resolve(slot + FrameLog.Suffix),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)))
  def append(off: Long, payload: Array[Byte]): Unit = {
    out.writeLong(off)
    out.writeInt(payload.length)
    out.write(payload)
  }
  def flush(): Unit = out.flush()
  def close(): Unit = try out.close() catch { case _: IOException => () }
}
