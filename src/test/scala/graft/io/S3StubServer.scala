package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, Executors}
import java.util.concurrent.atomic.AtomicLong

/** In-process loopback S3 endpoint — the minimal REST subset
  * [[S3ObjectStore]] speaks (object GET/HEAD/PUT±`If-None-Match`/DELETE
  * + `ListObjectsV2` with real `IsTruncated` paging), hand-rolled over a
  * `ServerSocket` so every byte on the wire is under test control: the
  * fault queue can refuse a request (503/409 WITHOUT applying it), or
  * apply it and then lose the success response (hang up / 500) — the
  * ambiguity class the conditional-PUT disambiguation exists for, which
  * an in-process fake can never produce. State lives in an
  * [[InMemoryObjectStore]] (whose tiny LIST pages also bound the stub's
  * page size, so multi-page listings are exercised over HTTP).
  *
  * Every request is authenticated the way a real endpoint would: the
  * stub checks `x-amz-content-sha256` against the RECEIVED body and
  * recomputes the SigV4 signature from the PARSED WIRE FORM (method,
  * raw path, decoded query, the headers named in `SignedHeaders`) — so
  * a client that canonicalizes differently from what it sends (wrong
  * host:port, unsorted query, stale payload hash) gets a 403, exactly
  * as AWS would answer. Responses carry the extra elements current AWS
  * ListObjectsV2 bodies interleave (`ETag`, `ChecksumAlgorithm`,
  * `ChecksumType`, `StorageClass`) plus indentation, so the client's
  * parse is proven against the 2025-shaped wire format, not a
  * convenient minimal one.
  */
final class S3StubServer(
    val backing: InMemoryObjectStore,
    val accessKey: String = "STUBACCESSKEY",
    val secretKey: String = "stub/secret+key",
    val region: String = "stub-east-1") {
  import S3StubServer._

  private val server =
    new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  def endpoint: String = s"http://127.0.0.1:$port"

  /** Next-request fault directives, consumed front-to-first-match by
    * method. Tests enqueue, the server obeys once per entry.
    */
  val faults = new ConcurrentLinkedQueue[Fault]()

  /** Requests served per method (fault-answered ones included). */
  val hits = new ConcurrentHashMap[String, AtomicLong]()
  def hitCount(method: String): Long =
    Option(hits.get(method)).map(_.get()).getOrElse(0L)

  @volatile private var running = true
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "s3-stub"); t.setDaemon(true); t
  })
  pool.execute(() => {
    while (running) {
      try {
        val sock = server.accept()
        pool.execute(() => handle(sock))
      } catch { case _: java.io.IOException => () /* closed */ }
    }
  })

  def close(): Unit = {
    running = false
    try server.close() catch { case _: java.io.IOException => () }
    pool.shutdownNow(); ()
  }

  // ---------------------------------------------------------------- wire

  private def handle(sock: Socket): Unit = {
    try {
      sock.setSoTimeout(20000)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      val reqLine = readLine(in)
      if (reqLine == null || reqLine.isEmpty) { sock.close(); return }
      val parts = reqLine.split(" ", 3)
      val method = parts(0)
      val target = parts(1)
      val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var line = readLine(in)
      while (line != null && line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) headers(line.substring(0, i).trim.toLowerCase) =
          line.substring(i + 1).trim
        line = readLine(in)
      }
      val body = headers.get("content-length").map(_.toLong) match {
        case Some(n) if n > 0 =>
          val buf = new Array[Byte](n.toInt)
          var off = 0
          while (off < n) {
            val k = in.read(buf, off, n.toInt - off)
            if (k < 0) throw new java.io.EOFException("body truncated")
            off += k
          }
          buf
        case _ => Array.emptyByteArray
      }
      hits.computeIfAbsent(method, _ => new AtomicLong()).incrementAndGet()

      val (rawPath, rawQuery) = target.indexOf('?') match {
        case -1 => (target, "")
        case i  => (target.substring(0, i), target.substring(i + 1))
      }
      val query: Map[String, String] = rawQuery.split("&").iterator
        .filter(_.nonEmpty).map { kv =>
          kv.indexOf('=') match {
            case -1 => percentDecode(kv) -> ""
            case i  => percentDecode(kv.substring(0, i)) ->
              percentDecode(kv.substring(i + 1))
          }
        }.toMap
      // /<bucket>/<key> — key may be empty (the LIST form)
      val path = percentDecode(rawPath)
      val key = path.split("/", 3) match {
        case Array(_, _, k) => k
        case _              => ""
      }

      authFailure(method, rawPath, rawQuery, headers.toMap, body) match {
        case Some(why) =>
          respond(out, 403, xmlError("SignatureDoesNotMatch", why)); return
        case None => ()
      }

      // fault directives: first queued entry matching this method fires
      pollFault(method) match {
        case Some(Fault(_, Refuse(status))) =>
          respond(out, status, xmlError("ServiceUnavailable", "injected"))
          return
        case Some(Fault(_, ApplyThenHangup)) =>
          apply(method, key, query, headers.toMap, body)
          sock.close() // success response LOST — the ambiguity class
          return
        case Some(Fault(_, ApplyThen(status))) =>
          apply(method, key, query, headers.toMap, body)
          respond(out, status, xmlError("InternalError", "injected"))
          return
        case None => ()
      }

      apply(method, key, query, headers.toMap, body) match {
        case Reply(status, respBody, respHeaders, headOnly) =>
          respond(out, status, respBody, respHeaders, headOnly)
      }
    } catch {
      case scala.util.control.NonFatal(_) => ()
    } finally {
      try sock.close() catch { case _: java.io.IOException => () }
    }
  }

  private def apply(
      method: String,
      key: String,
      query: Map[String, String],
      headers: Map[String, String],
      body: Array[Byte]): Reply = method match {
    case "GET" if query.get("list-type").contains("2") =>
      val prefix = query.getOrElse("prefix", "")
      val after = query.getOrElse("start-after", "")
      val maxKeys = query.get("max-keys").map(_.toInt).getOrElse(1000)
      val (page, truncated) = backing.listPage(prefix, after, maxKeys)
      Reply(200, listXml(prefix, page, truncated))
    case "GET" =>
      backing.get(key) match {
        case Some(bytes) => Reply(200, bytes, objHeaders(key))
        case None => Reply(404, xmlError("NoSuchKey", key))
      }
    case "HEAD" =>
      backing.head(key) match {
        case Some(m) => Reply(200, new Array[Byte](m.size.toInt),
          objHeaders(key), headOnly = true)
        case None => Reply(404, Array.emptyByteArray, Nil, headOnly = true)
      }
    case "PUT" if headers.contains("if-none-match") =>
      if (backing.putIfNoneMatch(key, body))
        Reply(200, Array.emptyByteArray,
          Seq("ETag" -> ("\"" + S3ObjectStore.hexSha256(body).take(32) + "\"")))
      else Reply(412, xmlError("PreconditionFailed", key))
    case "PUT" =>
      backing.put(key, body)
      Reply(200, Array.emptyByteArray,
        Seq("ETag" -> ("\"" + S3ObjectStore.hexSha256(body).take(32) + "\"")))
    case "DELETE" =>
      backing.delete(key)
      Reply(204, Array.emptyByteArray)
    case other =>
      Reply(400, xmlError("MethodNotAllowed", other))
  }

  private def objHeaders(key: String): Seq[(String, String)] =
    backing.head(key).toSeq.map(m => "Last-Modified" ->
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(m.mtimeMillis)))

  /** SigV4 verification from the wire form; None = authenticated. */
  private def authFailure(
      method: String,
      rawPath: String,
      rawQuery: String,
      headers: Map[String, String],
      body: Array[Byte]): Option[String] = {
    val auth = headers.getOrElse("authorization", return Some("no Authorization"))
    if (!auth.startsWith("AWS4-HMAC-SHA256 Credential=" + accessKey + "/"))
      return Some("wrong credential")
    val declaredHash = headers.getOrElse("x-amz-content-sha256",
      return Some("no payload hash"))
    if (declaredHash != S3ObjectStore.hexSha256(body))
      return Some("payload hash mismatch: body does not match x-amz-content-sha256")
    val amzDate = headers.getOrElse("x-amz-date", return Some("no x-amz-date"))
    val signedNames = auth.split("SignedHeaders=")(1).split(",")(0).trim
      .split(";").toSeq
    val signedHeaders = signedNames.map { n =>
      n -> headers.getOrElse(n, return Some(s"signed header $n absent"))
    }
    val query = rawQuery.split("&").iterator.filter(_.nonEmpty).map { kv =>
      kv.indexOf('=') match {
        case -1 => percentDecode(kv) -> ""
        case i  => percentDecode(kv.substring(0, i)) ->
          percentDecode(kv.substring(i + 1))
      }
    }.toSeq
    val expect = S3ObjectStore.sigV4(method, rawPath, query, signedHeaders,
      declaredHash, amzDate.take(8), region, "s3", accessKey, secretKey)
    if (expect != auth)
      Some(s"signature mismatch (server reconstruction from wire differs)")
    else None
  }

  /** Current-AWS-shaped ListObjectsV2 body: indentation, and the extra
    * per-object elements (ETag, the 2025 default checksums, storage
    * class) interleaved between the fields the client needs.
    */
  private def listXml(
      prefix: String,
      page: Seq[ObjectStoreApi.ObjMeta],
      truncated: Boolean): Array[Byte] = {
    val items = page.map { m =>
      s"""  <Contents>
         |    <Key>${xmlEscape(m.key)}</Key>
         |    <LastModified>${java.time.Instant.ofEpochMilli(m.mtimeMillis)}</LastModified>
         |    <ETag>&quot;${m.key.hashCode.toHexString}&quot;</ETag>
         |    <ChecksumAlgorithm>CRC64NVME</ChecksumAlgorithm>
         |    <ChecksumType>FULL_OBJECT</ChecksumType>
         |    <Size>${m.size}</Size>
         |    <StorageClass>STANDARD</StorageClass>
         |  </Contents>""".stripMargin
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
       |  <Name>${backing.bucket}</Name>
       |  <Prefix>${xmlEscape(prefix)}</Prefix>
       |  <KeyCount>${page.size}</KeyCount>
       |  <IsTruncated>$truncated</IsTruncated>
       |$items
       |</ListBucketResult>
       |""".stripMargin.getBytes(StandardCharsets.UTF_8)
  }

  // peek+poll atomically: two concurrent requests must never each
  // consume the OTHER's fault directive
  private def pollFault(method: String): Option[Fault] = faults.synchronized {
    val head = faults.peek()
    if (head != null && head.method == method) Option(faults.poll())
    else None
  }

  private def respond(
      out: BufferedOutputStream,
      status: Int,
      body: Array[Byte],
      extra: Seq[(String, String)] = Nil,
      headOnly: Boolean = false): Unit = {
    val reason = status match {
      case 200 => "OK"; case 204 => "No Content"; case 403 => "Forbidden"
      case 404 => "Not Found"; case 409 => "Conflict"
      case 412 => "Precondition Failed"; case 500 => "Internal Server Error"
      case 503 => "Slow Down"; case _ => "Status"
    }
    val sb = new StringBuilder
    sb.append(s"HTTP/1.1 $status $reason\r\n")
    extra.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    if (status != 204) sb.append(s"Content-Length: ${body.length}\r\n")
    sb.append("Connection: close\r\n\r\n")
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    if (!headOnly && status != 204) out.write(body)
    out.flush()
  }
}

object S3StubServer {
  sealed trait Action
  /** Refuse without applying (503 SlowDown burst, 409 conflict). */
  final case class Refuse(status: Int) extends Action
  /** Apply the operation, then close the socket with NO response —
    * the lost-success ambiguity a real network produces.
    */
  case object ApplyThenHangup extends Action
  /** Apply the operation, then answer a retriable failure status. */
  final case class ApplyThen(status: Int) extends Action

  final case class Fault(method: String, action: Action)

  /** One response: status, body, extra headers, body-suppressed (HEAD). */
  final case class Reply(
      status: Int,
      body: Array[Byte],
      headers: Seq[(String, String)] = Nil,
      headOnly: Boolean = false)

  private[io] def xmlError(code: String, msg: String): Array[Byte] =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<Error><Code>$code</Code><Message>${xmlEscape(msg)}</Message></Error>
       |""".stripMargin.getBytes(StandardCharsets.UTF_8)

  private[io] def xmlEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private[io] def percentDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toString.getBytes(StandardCharsets.UTF_8)); i += 1 }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  private def readLine(in: java.io.InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream()
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') buf.write(b)
      b = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }
}
