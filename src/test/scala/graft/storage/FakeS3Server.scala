package graft.storage

import java.io.{BufferedOutputStream, DataInputStream, IOException}
import java.net.{ServerSocket, Socket, URLDecoder}
import java.nio.charset.StandardCharsets

/** Minimal S3-compatible HTTP server for specs — the local stand-in
  * MinIO would be: an in-memory keyspace whose `If-None-Match: *` PUT
  * is a real CAS (`ConcurrentHashMap.putIfAbsent`), ListObjectsV2 with
  * prefix + continuation-token pagination (a tiny page size by default
  * so the client's pagination loop actually executes), and — when
  * credentials are set — AWS SigV4 verification recomputed FROM THE
  * WIRE: the canonical request is rebuilt from the received method,
  * path, query, headers, and body hash, so a client that signs
  * anything other than what it actually sent gets a 403 here, the same
  * failure a real bucket would give. Thread-per-connection: concurrent
  * PUT races arbitrate in the map exactly once. */
final class FakeS3Server(
    bucket: String,
    credentials: Option[(String, String)] = None,
    region: String = "us-east-1",
    pageSize: Int = 2) {

  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val server = new ServerSocket(0)
  @volatile private var stopped = false
  val sigFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  val requests = new java.util.concurrent.atomic.AtomicInteger(0)
  /** While positive, conditional PUTs answer 409 ConditionalRequestConflict
    * (AWS's "another conditional writer is racing you" arm) and
    * decrement — the client must retry, then settle via existence. */
  val conflictPuts = new java.util.concurrent.atomic.AtomicInteger(0)

  def port: Int = server.getLocalPort
  def endpoint: String = s"http://127.0.0.1:$port"
  def size: Int = objects.size()
  def contents(key: String): Option[Array[Byte]] = Option(objects.get(key))
  /** Test hook: drop an object in as if another writer created it. */
  def preload(key: String, bytes: Array[Byte]): Unit = {
    objects.put(key, bytes); ()
  }

  private val acceptor = new Thread(() => {
    while (!stopped) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: IOException => () } // closed
    }
  }, "fake-s3-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    stopped = true
    try server.close() catch { case _: IOException => () }
  }

  // --------------------------------------------------------------

  private def handle(s: Socket): Unit = {
    try {
      val in = new DataInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      val requestLine = readLine(in)
      if (requestLine == null || requestLine.isEmpty) { s.close(); return }
      requests.incrementAndGet()
      val Array(method, target, _) = requestLine.split(" ", 3)
      val (rawPath, rawQuery) = target.indexOf('?') match {
        case -1 => (target, "")
        case i => (target.substring(0, i), target.substring(i + 1))
      }
      val headers = Iterator.continually(readLine(in))
        .takeWhile(l => l != null && l.nonEmpty)
        .map { l =>
          val i = l.indexOf(':')
          l.substring(0, i).toLowerCase -> l.substring(i + 1).trim
        }.toMap
      val body = headers.get("content-length").map(_.toInt) match {
        case Some(n) if n > 0 =>
          val buf = new Array[Byte](n); in.readFully(buf); buf
        case _ => Array.emptyByteArray
      }
      def respond(code: Int, reason: String,
          payload: Array[Byte] = Array.emptyByteArray,
          extra: Seq[String] = Nil): Unit = {
        val head = (Seq(s"HTTP/1.1 $code $reason",
          s"Content-Length: ${payload.length}", "Connection: close") ++
          extra).mkString("", "\r\n", "\r\n\r\n")
        out.write(head.getBytes(StandardCharsets.UTF_8))
        out.write(payload)
        out.flush()
      }

      if (!verifySignature(method, rawPath, rawQuery, headers, body)) {
        sigFailures.incrementAndGet()
        respond(403, "Forbidden",
          "<Error><Code>SignatureDoesNotMatch</Code></Error>"
            .getBytes(StandardCharsets.UTF_8))
        s.close(); return
      }

      val bucketPrefix = s"/$bucket"
      if (!rawPath.startsWith(bucketPrefix)) {
        respond(404, "Not Found"); s.close(); return
      }
      val keyPart = rawPath.stripPrefix(bucketPrefix).stripPrefix("/")
      val key = keyPart.split("/", -1)
        .map(URLDecoder.decode(_, "UTF-8")).mkString("/")
      val query = parseQuery(rawQuery)

      (method, key) match {
        case ("PUT", k) if k.nonEmpty =>
          if (headers.get("if-none-match").contains("*")) {
            if (conflictPuts.getAndUpdate(n => math.max(0, n - 1)) > 0)
              respond(409, "Conflict",
                "<Error><Code>ConditionalRequestConflict</Code></Error>"
                  .getBytes(StandardCharsets.UTF_8))
            else if (objects.putIfAbsent(k, body) == null)
              respond(200, "OK", extra = Seq("ETag: \"fake\""))
            else respond(412, "Precondition Failed",
              "<Error><Code>PreconditionFailed</Code></Error>"
                .getBytes(StandardCharsets.UTF_8))
          } else { objects.put(k, body); respond(200, "OK") }
        case ("GET", "") if query.get("list-type").contains("2") =>
          respond(200, "OK", listXml(query))
        case ("GET", k) =>
          Option(objects.get(k)) match {
            case Some(b) => respond(200, "OK", b)
            case None => respond(404, "Not Found",
              "<Error><Code>NoSuchKey</Code></Error>"
                .getBytes(StandardCharsets.UTF_8))
          }
        case ("DELETE", k) => objects.remove(k); respond(204, "No Content")
        case _ => respond(405, "Method Not Allowed")
      }
      s.close()
    } catch { case _: Throwable => try s.close() catch { case _: Throwable => () } }
  }

  private def listXml(query: Map[String, String]): Array[Byte] = {
    val prefix = query.getOrElse("prefix", "")
    val all = {
      import scala.jdk.CollectionConverters._
      objects.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
    }
    val from = query.get("continuation-token") // = last key of prior page
      .map(t => all.indexOf(t) + 1).getOrElse(0)
    val page = all.slice(from, from + pageSize)
    val truncated = from + pageSize < all.size
    val sb = new StringBuilder("<?xml version=\"1.0\"?><ListBucketResult>")
    page.foreach(k => sb.append("<Contents><Key>").append(xmlEscape(k))
      .append("</Key></Contents>"))
    sb.append("<IsTruncated>").append(truncated).append("</IsTruncated>")
    if (truncated) sb.append("<NextContinuationToken>")
      .append(xmlEscape(page.last)).append("</NextContinuationToken>")
    sb.append("</ListBucketResult>")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Recompute SigV4 from what actually arrived; anonymous mode (no
    * credentials) accepts everything. */
  private def verifySignature(method: String, rawPath: String,
      rawQuery: String, headers: Map[String, String],
      body: Array[Byte]): Boolean = credentials.forall { case (_, secret) =>
    val auth = headers.getOrElse("authorization", return false)
    val sigHeaders = "SignedHeaders=([^,]+),".r.findFirstMatchIn(auth)
      .map(_.group(1)).getOrElse(return false)
    val gotSig = "Signature=([0-9a-f]+)".r.findFirstMatchIn(auth)
      .map(_.group(1)).getOrElse(return false)
    val amzDate = headers.getOrElse("x-amz-date", return false)
    val payloadHash = headers.getOrElse("x-amz-content-sha256", return false)
    if (payloadHash != hex(sha256(body))) return false // body integrity
    val canonicalHeaders = sigHeaders.split(";").map { h =>
      s"$h:${headers.getOrElse(h, return false)}\n"
    }.mkString
    val canonicalQuery = rawQuery.split("&").filter(_.nonEmpty).sorted
      .mkString("&")
    val canonicalRequest = Seq(method, rawPath, canonicalQuery,
      canonicalHeaders, sigHeaders, payloadHash).mkString("\n")
    val date = amzDate.take(8)
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate,
      s"$date/$region/s3/aws4_request",
      hex(sha256(canonicalRequest.getBytes(StandardCharsets.UTF_8))))
      .mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      ("AWS4" + secret).getBytes(StandardCharsets.UTF_8), date),
      region), "s3"), "aws4_request")
    hex(hmac(kSigning, stringToSign)) == gotSig
  }

  private def parseQuery(q: String): Map[String, String] =
    q.split("&").filter(_.nonEmpty).map { kv =>
      kv.indexOf('=') match {
        case -1 => kv -> ""
        case i => kv.substring(0, i) ->
          URLDecoder.decode(kv.substring(i + 1), "UTF-8")
      }
    }.toMap

  private def readLine(in: DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    if (c == -1 && sb.isEmpty) null else sb.toString
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(StandardCharsets.UTF_8))
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  private def xmlEscape(s: String): String = s.replace("&", "&amp;")
    .replace("<", "&lt;").replace(">", "&gt;")
}
