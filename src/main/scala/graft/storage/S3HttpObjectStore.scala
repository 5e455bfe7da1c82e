package graft.storage

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

/** [[ConditionalObjectApi]] over the S3 HTTP surface — the REAL-store
  * binding for [[ConditionalPutJournalStore]], closing the
  * s3a/gs/wasb gap [[HadoopJournalStore]] refuses (its refusal message
  * routes here). Speaks the PUBLIC S3 REST semantics every
  * S3-compatible store (AWS, MinIO, Ceph RGW, R2) serves
  * (the reference reaches its bucket the same way, through its object
  * storage client — `/root/reference/storage/object_storage.go`):
  *
  *  - create-if-absent: one `PUT` with `If-None-Match: *` — 200 wins,
  *    `412 Precondition Failed` means the key exists (and `409`, AWS's
  *    "concurrent conditional writers" answer, is a lost claim too:
  *    some other writer holds the slot either way);
  *  - read: `GET` (404 → None);
  *  - list: `GET ?list-type=2&prefix=` (ListObjectsV2), following
  *    `NextContinuationToken` so a journal longer than one page still
  *    lists completely;
  *  - delete: `DELETE`.
  *
  * Requests carry AWS Signature V4 when credentials are given (the
  * published canonical-request/HMAC-chain algorithm, implemented here
  * directly — no SDK); anonymous otherwise (MinIO with a public
  * policy, CI fakes). Zero dependencies beyond `java.net`: the journal
  * writes a handful of small JSON objects, so connection pooling and
  * async IO would buy nothing at the cost of a client library.
  *
  * NOT a general S3 client: multipart, versioning, and >1000-key
  * single pages are out of scope — journal objects are tiny and the
  * list is paged. */
final class S3HttpObjectStore(
    endpoint: String, // e.g. "http://127.0.0.1:9000"
    bucket: String,
    credentials: Option[(String, String)] = None, // (accessKey, secretKey)
    region: String = "us-east-1",
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 15000,
    conflictRetries: Int = 5,
    conflictBackoffMs: Long = 100L) extends ConditionalObjectApi {

  private val base = endpoint.stripSuffix("/")

  /** 412 is definitive (the key exists); 409 — AWS's
    * ConditionalRequestConflict — only means ANOTHER conditional PUT is
    * in flight, and that writer may itself fail, so 409 retries with
    * backoff and, once retries are exhausted, the verdict comes from an
    * existence check: false only when the key REALLY exists (someone
    * won), an error otherwise — returning false for a never-created key
    * would make the journal report a version that has no manifest. */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    var attempt = 0
    while (true) {
      putOnce(key, bytes) match {
        case Some(won) => return won
        case None => // 409: conflict still racing
          attempt += 1
          if (attempt > conflictRetries) {
            if (get(key).isDefined) return false
            throw new java.io.IOException(
              s"S3 PUT '$key': conditional-request conflict persisted " +
                s"across $conflictRetries retries and the key still does " +
                "not exist")
          }
          Thread.sleep(conflictBackoffMs * attempt)
      }
    }
    false // unreachable
  }

  /** One conditional PUT: Some(true) created, Some(false) exists (412),
    * None on a 409 conflict. */
  private def putOnce(key: String, bytes: Array[Byte]): Option[Boolean] = {
    val c = open("PUT", s"/$bucket/${encPath(key)}", "")
    c.setRequestProperty("If-None-Match", "*")
    c.setRequestProperty("Content-Type", "application/octet-stream")
    sign(c, "PUT", s"/$bucket/${encPath(key)}", "", bytes,
      extraSigned = Seq("if-none-match" -> "*"))
    c.setDoOutput(true)
    c.setFixedLengthStreamingMode(bytes.length)
    val out = c.getOutputStream
    try out.write(bytes) finally out.close()
    c.getResponseCode match {
      case 200 => drain(c); Some(true)
      case 412 => drain(c); Some(false)
      case 409 => drain(c); None
      case other => fail("PUT", key, other, c)
    }
  }

  def get(key: String): Option[Array[Byte]] = {
    val c = open("GET", s"/$bucket/${encPath(key)}", "")
    sign(c, "GET", s"/$bucket/${encPath(key)}", "", Array.emptyByteArray)
    c.getResponseCode match {
      case 200 =>
        val in = c.getInputStream
        try Some(in.readAllBytes()) finally in.close()
      case 404 => drain(c); None
      case other => fail("GET", key, other, c)
    }
  }

  def listPrefix(prefix: String): Seq[String] = {
    val keys = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = "list-type=2&prefix=" + enc(prefix) +
        token.fold("")(t => "&continuation-token=" + enc(t))
      val c = open("GET", s"/$bucket", q)
      sign(c, "GET", s"/$bucket", q, Array.emptyByteArray)
      val code = c.getResponseCode
      if (code != 200) fail("LIST", prefix, code, c)
      val xml = {
        val in = c.getInputStream
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      }
      keys ++= KeyTag.findAllMatchIn(xml).map(m => xmlUnescape(m.group(1)))
      token = TokenTag.findFirstMatchIn(xml).map(m => xmlUnescape(m.group(1)))
      more = token.isDefined &&
        TruncTag.findFirstMatchIn(xml).exists(_.group(1) == "true")
    }
    keys.result()
  }

  def delete(key: String): Unit = {
    val c = open("DELETE", s"/$bucket/${encPath(key)}", "")
    sign(c, "DELETE", s"/$bucket/${encPath(key)}", "", Array.emptyByteArray)
    c.getResponseCode match {
      case 200 | 204 | 404 => drain(c)
      case other => fail("DELETE", key, other, c)
    }
  }

  // --------------------------------------------------------------
  // plumbing

  private val KeyTag = "<Key>(.*?)</Key>".r
  private val TokenTag = "<NextContinuationToken>(.*?)</NextContinuationToken>".r
  private val TruncTag = "<IsTruncated>(.*?)</IsTruncated>".r

  private def open(method: String, path: String,
      query: String): HttpURLConnection = {
    val url = new URL(base + path + (if (query.isEmpty) "" else "?" + query))
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(connectTimeoutMs)
    c.setReadTimeout(readTimeoutMs)
    c
  }

  private def drain(c: HttpURLConnection): Unit = {
    val s = if (c.getResponseCode >= 400) c.getErrorStream else c.getInputStream
    if (s != null) try { s.readAllBytes(); () } finally s.close()
  }

  private def fail(op: String, key: String, code: Int,
      c: HttpURLConnection): Nothing = {
    val detail =
      try Option(c.getErrorStream).map { s =>
        try new String(s.readAllBytes(), StandardCharsets.UTF_8).take(300)
        finally s.close()
      }.getOrElse("")
      catch { case _: java.io.IOException => "" }
    throw new java.io.IOException(s"S3 $op '$key' failed: HTTP $code $detail")
  }

  /** RFC 3986 unreserved-only encoding (the S3 canonical form). */
  private def enc(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).flatMap { b =>
      val ch = b.toChar
      if ((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z') ||
        (ch >= '0' && ch <= '9') || ch == '-' || ch == '_' || ch == '.' ||
        ch == '~') Seq(ch)
      else f"%%${b & 0xff}%02X".toSeq
    }.mkString

  /** Path encoding: each segment encoded, '/' kept (S3 object keys are
    * slash-structured). */
  private def encPath(key: String): String =
    key.split("/", -1).map(enc).mkString("/")

  // --------------------------------------------------------------
  // AWS Signature V4 (public algorithm: canonical request → string to
  // sign → HMAC key chain → Authorization header). Skipped entirely
  // when no credentials are configured.

  private def sign(c: HttpURLConnection, method: String, path: String,
      query: String, payload: Array[Byte],
      extraSigned: Seq[(String, String)] = Nil): Unit = {
    val payloadHash = hex(sha256(payload))
    c.setRequestProperty("x-amz-content-sha256", payloadHash)
    credentials.foreach { case (access, secret) =>
      val now = java.time.Instant.now().atZone(java.time.ZoneOffset.UTC)
      val amzDate = now.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
      val date = amzDate.take(8)
      c.setRequestProperty("x-amz-date", amzDate)
      val host = new URL(base).getAuthority
      val headers = (Seq(
        "host" -> host,
        "x-amz-content-sha256" -> payloadHash,
        "x-amz-date" -> amzDate) ++ extraSigned).sortBy(_._1)
      val signedNames = headers.map(_._1).mkString(";")
      // canonical query: name=value pairs sorted by name (ours already
      // carry encoded values)
      val canonicalQuery = query.split("&").filter(_.nonEmpty).sorted
        .mkString("&")
      val canonicalRequest = Seq(
        method, path, canonicalQuery,
        headers.map { case (k, v) => s"$k:$v\n" }.mkString,
        signedNames, payloadHash).mkString("\n")
      val scope = s"$date/$region/s3/aws4_request"
      val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
        hex(sha256(canonicalRequest.getBytes(StandardCharsets.UTF_8))))
        .mkString("\n")
      val kDate = hmac(("AWS4" + secret).getBytes(StandardCharsets.UTF_8), date)
      val kRegion = hmac(kDate, region)
      val kService = hmac(kRegion, "s3")
      val kSigning = hmac(kService, "aws4_request")
      val signature = hex(hmac(kSigning, stringToSign))
      c.setRequestProperty("Authorization",
        s"AWS4-HMAC-SHA256 Credential=$access/$scope, " +
          s"SignedHeaders=$signedNames, Signature=$signature")
    }
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(StandardCharsets.UTF_8))
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  private def xmlUnescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
    .replace("&apos;", "'").replace("&amp;", "&")
}
