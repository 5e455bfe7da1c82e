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
    connectTimeoutMs: Int = 4000,
    // Some(ctx) → STARTTLS-style upgrade: SSLRequest before the startup
    // message, the TLS handshake through ctx (production: a default
    // SSLContext; tests: one trusting a local self-signed cert), and
    // the whole protocol — auth included — over the wrapped socket.
    sslContext: Option[javax.net.ssl.SSLContext] = None,
    // liveness deadline: a replication socket with NO XLogData or
    // keepalive for this long is a dead/stalled primary, not an idle
    // one (a healthy primary keepalives at wal_sender_timeout/2) —
    // drop and reconnect-resume. The MySQL client's heartbeat-window
    // guard, on the side where the server volunteers the cadence.
    deadIntervalMs: Long = 60000L) {

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

  /** True once the CURRENT connection attempt reached streaming state
    * (startup + CopyBoth) — proof the primary is alive and willing, so
    * a later drop of that connection restarts the failure budget
    * instead of consuming it. Without this, `maxRetries` counts
    * failures over the daemon's whole LIFETIME: six disconnects spread
    * over six days — or six liveness-deadline trips against a healthy
    * idle primary with keepalives off — would kill replication
    * permanently. */
  @volatile private var attemptProgressed = false
  /** Wall-clock bound on the connection-setup phase (auth, CopyBoth);
    * [[checkSetupDeadline]] enforces it on idle ticks. */
  @volatile private var setupDeadline = Long.MaxValue

  private def checkSetupDeadline(phase: String): Unit =
    if (System.currentTimeMillis() > setupDeadline)
      throw new IOException(
        s"server silent during $phase — connection setup timed out")

  /** Blocking connect-stream-reconnect loop. `maxRetries` bounds
    * CONSECUTIVE attempts that fail before reaching streaming state. */
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
          failures = if (attemptProgressed) 1 else failures + 1
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
    attemptProgressed = false
    val plain = new Socket()
    socket = plain // stop() can close it even mid-TLS-handshake
    plain.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    // bound the raw SSLRequest-response read (no message framing yet)
    plain.setSoTimeout(math.max(connectTimeoutMs, 1000))
    val s = sslContext.fold(plain)(ctx => startTls(plain, ctx))
    socket = s
    // short read timeouts keep the status-update clock ticking while
    // the stream is idle
    s.setSoTimeout(math.min(statusIntervalMs, 250L).toInt)
    val in = new DataInputStream(s.getInputStream)
    val out = new DataOutputStream(s.getOutputStream)
    val log = new FrameAppender(dir, slot)
    try {
      // the setup loops convert socket timeouts into idle ticks, so a
      // server that accepts and then stalls mid-auth would spin forever
      // without a wall-clock deadline — liveness must cover setup too
      setupDeadline = System.currentTimeMillis() +
        math.max(connectTimeoutMs * 4L, 2000L)
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
      setupDeadline = Long.MaxValue
      attemptProgressed = true // streaming state reached
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
      var lastTrafficAt = System.currentTimeMillis()
      while (!stopped) {
        readMessage(in) match {
          case None => // idle timeout tick
            if (deadIntervalMs > 0 &&
              System.currentTimeMillis() - lastTrafficAt > deadIntervalMs)
              throw new IOException(
                s"primary silent for ${deadIntervalMs}ms (no XLogData or " +
                  "keepalive) — treating the connection as dead")
          case Some(('E', body)) =>
            throw new IOException(s"server error: ${errorText(body)}")
          case Some(('d', body)) =>
            lastTrafficAt = System.currentTimeMillis()
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

  /** SSLRequest (the PG STARTTLS analog): Int32(8) + magic 80877103
    * BEFORE any startup message; 'S' → run the TLS handshake and speak
    * the whole protocol over the wrapped socket, 'N' → the server
    * refuses TLS (fail loudly: the caller asked for it). */
  private def startTls(plain: Socket,
      ctx: javax.net.ssl.SSLContext): Socket = {
    val out = new DataOutputStream(plain.getOutputStream)
    out.writeInt(8)
    out.writeInt(80877103)
    out.flush()
    val r = plain.getInputStream.read()
    if (r != 'S')
      throw new IOException(
        s"server refused TLS (SSLRequest answered ${if (r < 0) "EOF" else r.toChar.toString})")
    val ssl = ctx.getSocketFactory
      .createSocket(plain, host, port, true)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    ssl.setUseClientMode(true)
    ssl.startHandshake()
    ssl
  }

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
        case None => checkSetupDeadline("startup/authentication")
        case Some(('R', body)) =>
          beInt(body, 0) match {
            case 0 => () // AuthenticationOk
            case 3 => // cleartext password
              sendMessage(out, 'p', cstr(password.getOrElse("")))
            case 10 => // AuthenticationSASL: NUL-separated mechanism list
              val mechs = new String(body, 4, body.length - 4,
                StandardCharsets.UTF_8).split("\u0000").filter(_.nonEmpty)
              if (!mechs.contains("SCRAM-SHA-256"))
                throw new IOException("server offers SASL mechanisms " +
                  s"${mechs.mkString(",")}; only SCRAM-SHA-256 is supported")
              scramAuthenticate(in, out)
            case other => throw new IOException(
              s"unsupported authentication request $other (trust, " +
                "cleartext password, or SCRAM-SHA-256)")
          }
        case Some(('E', body)) =>
          throw new IOException(s"startup failed: ${errorText(body)}")
        case Some(('Z', _)) => ready = true
        case Some(_) => () // ParameterStatus / BackendKeyData
      }
    }
  }

  /** SCRAM-SHA-256 (RFC 5802/7677 over the PG SASL framing — the same
    * public exchange pglogrepl negotiates for the reference,
    * `pgserver/logrepl/replication.go:222-683` via pgconn):
    *
    *   SASLInitialResponse("SCRAM-SHA-256", "n,,n=,r=<nonce>") →
    *   SASLContinue("r=<nonce+ext>,s=<salt>,i=<iters>") →
    *   SASLResponse("c=biws,r=<nonce+ext>,p=<proof>") →
    *   SASLFinal("v=<server signature>") — VERIFIED, a wrong v= is a
    *   spoofed server and fails the connection.
    *
    * The username travels in the startup message (n= stays empty, the
    * PG convention); passwords are used as UTF-8 bytes (SASLprep
    * normalization of exotic codepoints is out of scope — ASCII
    * passwords, the overwhelmingly common case, are unaffected). */
  private def scramAuthenticate(in: DataInputStream,
      out: DataOutputStream): Unit = {
    val pwd = password.getOrElse("")
    val nonce = {
      val raw = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(raw)
      java.util.Base64.getEncoder.encodeToString(raw)
    }
    val clientFirstBare = s"n=,r=$nonce"
    val init = new java.io.ByteArrayOutputStream()
    init.write(cstr("SCRAM-SHA-256"))
    val cf = ("n,," + clientFirstBare).getBytes(StandardCharsets.UTF_8)
    init.write((cf.length >> 24) & 0xff); init.write((cf.length >> 16) & 0xff)
    init.write((cf.length >> 8) & 0xff); init.write(cf.length & 0xff)
    init.write(cf)
    sendMessage(out, 'p', init.toByteArray)

    val serverFirst = expectSaslData(in, 11)
    val attrs = Scram.attributes(serverFirst)
    val combined = attrs.getOrElse("r",
      throw new IOException("SCRAM server-first lacks r="))
    if (!combined.startsWith(nonce))
      throw new IOException("SCRAM server-first nonce does not extend ours")
    val salt = java.util.Base64.getDecoder.decode(attrs("s"))
    val iters = attrs("i").toInt
    val salted = Scram.hi(pwd, salt, iters)
    val clientKey = Scram.hmac(salted, "Client Key")
    val clientFinalNoProof = s"c=biws,r=$combined" // biws = b64("n,,")
    val authMessage =
      clientFirstBare + "," + serverFirst + "," + clientFinalNoProof
    val proof = Scram.xor(clientKey,
      Scram.hmac(Scram.sha256(clientKey), authMessage))
    sendMessage(out, 'p', (clientFinalNoProof + ",p=" +
      java.util.Base64.getEncoder.encodeToString(proof))
      .getBytes(StandardCharsets.UTF_8))

    val serverFinal = expectSaslData(in, 12)
    val wantV = java.util.Base64.getEncoder.encodeToString(
      Scram.hmac(Scram.hmac(salted, "Server Key"), authMessage))
    if (!Scram.attributes(serverFinal).get("v").contains(wantV))
      throw new IOException(
        "SCRAM server signature mismatch — server does not know the password")
    // AuthenticationOk follows; the startup loop consumes it
  }

  /** Next 'R' message, which must carry SASL code `want`; returns its
    * payload text. */
  private def expectSaslData(in: DataInputStream, want: Int): String = {
    while (true) {
      readMessage(in) match {
        case None => checkSetupDeadline("SCRAM exchange")
        case Some(('R', body)) =>
          if (beInt(body, 0) != want)
            throw new IOException(
              s"expected SASL code $want, got ${beInt(body, 0)}")
          return new String(body, 4, body.length - 4, StandardCharsets.UTF_8)
        case Some(('E', body)) =>
          throw new IOException(s"SASL exchange failed: ${errorText(body)}")
        case Some(_) => ()
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def sendQuery(out: DataOutputStream, sql: String): Unit =
    sendMessage(out, 'Q', cstr(sql))

  private def expectCopyBoth(in: DataInputStream): Unit = {
    while (true) {
      readMessage(in) match {
        case None => checkSetupDeadline("START_REPLICATION")
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
    val start = System.currentTimeMillis()
    var done = 0
    while (done < buf.length) {
      try {
        val n = in.read(buf, done, buf.length - done)
        if (n < 0) throw new IOException("server closed connection mid-message")
        done += n
      } catch {
        case _: SocketTimeoutException =>
          // a message the server STARTED but stalls inside is a dead
          // connection too — both liveness deadlines apply here, or a
          // mid-message stall would spin on timeout ticks forever
          checkSetupDeadline("message read")
          if (deadIntervalMs > 0 &&
            System.currentTimeMillis() - start > deadIntervalMs)
            throw new IOException(
              s"server stalled mid-message for ${deadIntervalMs}ms")
      }
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

/** SCRAM-SHA-256 primitives (RFC 5802 §2.2/§3) — package-visible so the
  * scripted-server spec computes the same material to VERIFY the
  * client's proof rather than blindly accepting it. */
private[streaming] object Scram {
  import javax.crypto.Mac
  import javax.crypto.spec.SecretKeySpec

  def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  def hmac(key: Array[Byte], msg: String): Array[Byte] =
    hmac(key, msg.getBytes(StandardCharsets.UTF_8))

  def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  /** Hi(str, salt, i) = PBKDF2-HMAC-SHA256: U1 = HMAC(str, salt‖INT(1)),
    * Uₖ = HMAC(str, Uₖ₋₁), result = U1 ⊕ … ⊕ Uᵢ. Implemented directly
    * over the password's UTF-8 BYTES (PBEKeySpec's char[] round trip
    * invites charset surprises). */
  def hi(password: String, salt: Array[Byte], iters: Int): Array[Byte] = {
    val key = password.getBytes(StandardCharsets.UTF_8)
    var u = hmac(key, salt ++ Array[Byte](0, 0, 0, 1))
    val acc = u.clone()
    var i = 1
    while (i < iters) {
      u = hmac(key, u)
      var j = 0
      while (j < acc.length) { acc(j) = (acc(j) ^ u(j)).toByte; j += 1 }
      i += 1
    }
    acc
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.indices.map(i => (a(i) ^ b(i)).toByte).toArray

  /** "k1=v1,k2=v2" → map (SCRAM attribute lists; values may hold '='
    * — base64 padding — so split on the FIRST '=' only). */
  def attributes(s: String): Map[String, String] =
    s.split(",").filter(_.contains("=")).map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap
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
