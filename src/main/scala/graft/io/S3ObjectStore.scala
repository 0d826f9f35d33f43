package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** [[ObjectStoreApi]] against a REAL S3(-compatible) endpoint — the
  * conditional-PUT port the [[LogStore]] design note specifies, in pure
  * JDK (`java.net.http`; no SDK dependency). The commit claim maps to
  * `PUT` with `If-None-Match: *`: S3 answers `412 Precondition Failed`
  * when the key exists (GCS's XML API honors the same header), which is
  * EXACTLY [[ObjectStoreApi.putIfNoneMatch]]'s contract — so
  * `new ObjectStoreLogStore(p => (new S3ObjectStore(...), keyOf(p)))`
  * runs the whole transaction log against S3 with no further porting.
  * LIST maps to `ListObjectsV2` (`prefix`/`start-after`/`max-keys`,
  * paged), HEAD/GET/DELETE to themselves.
  *
  * Requests are SigV4-signed ([[S3ObjectStore.sigV4]] — the published
  * AWS algorithm, unit-tested offline against AWS's own documented
  * example vectors). This class is exercised end-to-end only where a
  * network exists; the protocol itself is proven in-process against
  * [[InMemoryObjectStore]], which honors the same semantics.
  */
final class S3ObjectStore(
    endpoint: String, // e.g. "https://s3.us-east-1.amazonaws.com"
    bucket: String,
    region: String,
    accessKey: String,
    secretKey: String,
    clock: () => java.time.Instant = () => java.time.Instant.now()) extends ObjectStoreApi {
  import ObjectStoreApi.ObjMeta
  import S3ObjectStore._

  // HTTP/1.1 pinned: S3 speaks 1.1, and the JDK default (HTTP_2) sends
  // h2c upgrade headers over plain http endpoints that some compatible
  // servers mishandle
  private val http =
    HttpClient.newBuilder().version(HttpClient.Version.HTTP_1_1).build()

  /** The `host` value that is SIGNED must be the authority the client
    * actually puts on the wire: the JDK client sends `Host: host:port`
    * whenever the port is non-default for the scheme (MinIO on :9000, a
    * loopback test endpoint), and the server reconstructs the canonical
    * request from that wire header — signing the bare hostname verifies
    * only against default-port endpoints.
    */
  private val host = {
    val u = URI.create(endpoint)
    val defaultPort = if (u.getScheme == "https") 443 else 80
    if (u.getPort > 0 && u.getPort != defaultPort) s"${u.getHost}:${u.getPort}"
    else u.getHost
  }

  /** Bounded exponential backoff for S3's transient failures (503
    * SlowDown under request-rate pressure, 500, connection resets) —
    * the client-side half of S3's documented throttling contract.
    * GET/HEAD/LIST/DELETE are idempotent and the unconditional PUT is
    * last-write-wins, so blind retry is safe for them. Returns the
    * final response plus whether any AMBIGUOUS failure happened along
    * the way (an IOException or a 500 — the request may have LANDED
    * server-side even though we never saw success): the conditional
    * PUT must disambiguate a post-retry 412 against that flag (see
    * [[putIfNoneMatch]]) or it would misread its own lost-response
    * write as a competitor's claim.
    */
  private def sendRetrying(
      method: String,
      key: String,
      query: Seq[(String, String)],
      body: Array[Byte],
      extraHeaders: Seq[(String, String)])
      : (HttpResponse[Array[Byte]], Boolean) = {
    var attempt = 0
    var ambiguous = false
    while (true) {
      val r: Either[java.io.IOException, HttpResponse[Array[Byte]]] =
        try Right(send(method, key, query, body, extraHeaders))
        catch { case e: java.io.IOException => Left(e) }
      val retriable = r match {
        case Left(_)     => true
        case Right(resp) => resp.statusCode() == 500 || resp.statusCode() == 503
      }
      r match { // 503 = service REFUSED (not landed); 500/IO = unknown
        case Left(_) => ambiguous = true
        case Right(resp) if resp.statusCode() == 500 => ambiguous = true
        case _ => ()
      }
      if (!retriable) return (r.toOption.get, ambiguous)
      attempt += 1
      if (attempt > 5) r match {
        case Left(e)     => throw e
        case Right(resp) => return (resp, ambiguous) // caller raises it
      }
      Thread.sleep(math.min(8000L, 100L << attempt)) // 200ms..6.4s
    }
    throw new IllegalStateException("unreachable")
  }

  private def send(
      method: String,
      key: String,
      query: Seq[(String, String)],
      body: Array[Byte],
      extraHeaders: Seq[(String, String)]): HttpResponse[Array[Byte]] = {
    val now = clock()
    val amzDate = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(now)
    val path = s"/$bucket/" + uriEncode(key, encodeSlash = false)
    val payloadHash = hexSha256(body)
    val baseHeaders = Seq(
      "host" -> host,
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> amzDate) ++ extraHeaders
    val auth = sigV4(method, path, query, baseHeaders, payloadHash,
      amzDate.take(8), region, "s3", accessKey, secretKey)
    val qs =
      if (query.isEmpty) ""
      else "?" + query.sortBy(_._1)
        .map { case (k, v) => s"${uriEncode(k)}=${uriEncode(v)}" }
        .mkString("&")
    val b = HttpRequest.newBuilder(URI.create(s"$endpoint$path$qs"))
      .method(method,
        if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
        else HttpRequest.BodyPublishers.ofByteArray(body))
    (baseHeaders.filterNot(_._1 == "host") :+ ("Authorization" -> auth))
      .foreach { case (k, v) => b.header(k, v) }
    http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }

  override def get(key: String): Option[Array[Byte]] = {
    val (r, _) = sendRetrying("GET", key, Nil, Array.emptyByteArray, Nil)
    if (r.statusCode() == 404) None
    else if (r.statusCode() / 100 == 2) Some(r.body())
    else throw new java.io.IOException(s"S3 GET $key: HTTP ${r.statusCode()}")
  }

  override def head(key: String): Option[ObjMeta] = {
    val (r, _) = sendRetrying("HEAD", key, Nil, Array.emptyByteArray, Nil)
    if (r.statusCode() == 404) None
    else if (r.statusCode() / 100 == 2)
      Some(ObjMeta(key,
        r.headers().firstValueAsLong("Content-Length").orElse(0L),
        r.headers().firstValue("Last-Modified").map[Long](d =>
          java.time.ZonedDateTime.parse(d,
            java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
            .toInstant.toEpochMilli).orElse(0L)))
    else throw new java.io.IOException(s"S3 HEAD $key: HTTP ${r.statusCode()}")
  }

  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
    var conflicts = 0
    var ambiguousEver = false
    while (true) {
      val (r, ambiguous) =
        sendRetrying("PUT", key, Nil, bytes, Seq("if-none-match" -> "*"))
      ambiguousEver ||= ambiguous
      r.statusCode() match {
        case c if c / 100 == 2 => return true
        case 412 =>
          // "taken" — but after an ambiguous failure the existing object
          // may be OUR OWN earlier attempt whose success response was
          // lost. Disambiguate by read-back: commit bytes are unique per
          // claim (the txn uuid is inside the manifest), so byte equality
          // means the claim is ours and this call SUCCEEDED. Without
          // this, a committer misreads its own write as a competitor's
          // and the rebase loop would fold its rows twice.
          return ambiguousEver && get(key).exists(java.util.Arrays.equals(_, bytes))
        case 409 =>
          // ConditionalRequestConflict: a CONCURRENT conditional write on
          // this key is in progress and neither outcome is known — AWS
          // documents it as retryable, and it is NOT "slot taken" (no
          // object may exist at the key). Re-probe: if an object landed,
          // the race has a winner (ours iff the bytes read back equal);
          // otherwise back off and retry the conditional PUT. Returning
          // false here would make BOTH racers report "lost" and the
          // claimed version would belong to nobody.
          ambiguousEver = true // our 409'd attempt's own fate is unknown
          conflicts += 1
          head(key) match {
            case Some(_) =>
              return get(key).exists(java.util.Arrays.equals(_, bytes))
            case None =>
              if (conflicts > 5) throw new java.io.IOException(
                s"S3 PUT $key: persistent 409 ConditionalRequestConflict")
              Thread.sleep(math.min(2000L, 50L << conflicts))
          }
        case c => throw new java.io.IOException(s"S3 PUT $key: HTTP $c")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def put(key: String, bytes: Array[Byte]): Unit = {
    val (r, _) = sendRetrying("PUT", key, Nil, bytes, Nil)
    if (r.statusCode() / 100 != 2)
      throw new java.io.IOException(s"S3 PUT $key: HTTP ${r.statusCode()}")
  }

  override def listPage(prefix: String, startAfter: String, maxKeys: Int)
      : (Seq[ObjMeta], Boolean) = {
    val q = Seq("list-type" -> "2", "prefix" -> prefix,
      "max-keys" -> maxKeys.toString) ++
      (if (startAfter.nonEmpty) Seq("start-after" -> startAfter) else Nil)
    val (r, _) = sendRetrying("GET", "", q, Array.emptyByteArray, Nil)
    if (r.statusCode() / 100 != 2)
      throw new java.io.IOException(s"S3 LIST $prefix: HTTP ${r.statusCode()}")
    parseList(r.body())
  }

  override def delete(key: String): Unit = {
    val (r, _) = sendRetrying("DELETE", key, Nil, Array.emptyByteArray, Nil)
    if (r.statusCode() / 100 != 2 && r.statusCode() != 404)
      throw new java.io.IOException(s"S3 DELETE $key: HTTP ${r.statusCode()}")
  }
}

object S3ObjectStore {
  import ObjectStoreApi.ObjMeta

  /** Order-independent ListObjectsV2 response parse via a REAL XML
    * parser (JDK DOM): each `<Contents>` element contributes one object,
    * with `Key`/`LastModified`/`Size` extracted BY NAME from its child
    * elements wherever they sit — so the extra elements current AWS
    * responses interleave (`ETag`, `ChecksumAlgorithm`/`ChecksumType`
    * since the 2025 default-checksum rollout, `StorageClass`, `Owner`)
    * and the whitespace/element-order liberties other S3-compatible
    * endpoints take can never silently DROP an entry the way a
    * fixed-sequence regex did (a dropped `<Contents>` made versions()
    * read the log as empty with no error). Entity unescaping is the
    * parser's. External entities and DTDs are disabled (the response is
    * untrusted bytes off the wire). A `<Contents>` MISSING one of the
    * three required fields is a protocol violation and throws loudly.
    */
  private[io] def parseList(body: Array[Byte]): (Seq[ObjMeta], Boolean) = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setExpandEntityReferences(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(body))
    def childText(e: org.w3c.dom.Element, name: String): Option[String] = {
      val kids = e.getChildNodes
      (0 until kids.getLength).iterator
        .map(kids.item)
        .collectFirst {
          case c: org.w3c.dom.Element if c.getTagName == name =>
            c.getTextContent
        }
    }
    val contents = doc.getElementsByTagName("Contents")
    val keys = (0 until contents.getLength).map { i =>
      val e = contents.item(i).asInstanceOf[org.w3c.dom.Element]
      def req(name: String): String = childText(e, name).getOrElse(
        throw new java.io.IOException(
          s"S3 LIST response: <Contents> #$i missing <$name>"))
      ObjMeta(req("Key"), req("Size").trim.toLong,
        java.time.Instant.parse(req("LastModified").trim).toEpochMilli)
    }
    val truncated = {
      val t = doc.getElementsByTagName("IsTruncated")
      t.getLength > 0 && t.item(0).getTextContent.trim.equalsIgnoreCase("true")
    }
    (keys, truncated)
  }

  private[io] def hexSha256(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"$b%02x").mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** AWS URI encoding (RFC 3986 unreserved + optional literal `/`). */
  private[io] def uriEncode(s: String, encodeSlash: Boolean = true): String =
    s.flatMap {
      case c if (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~' =>
        c.toString
      case '/' if !encodeSlash => "/"
      case c => c.toString.getBytes(StandardCharsets.UTF_8)
        .map(b => f"%%${b & 0xff}%02X").mkString
    }

  /** The published AWS Signature Version 4 algorithm: canonical request
    * → string-to-sign → HMAC chain → `Authorization` header value.
    * Pure function of its inputs (the date arrives as a parameter), so
    * it unit-tests offline against AWS's documented example vectors.
    */
  private[io] def sigV4(
      method: String,
      canonicalPath: String,
      query: Seq[(String, String)],
      headers: Seq[(String, String)], // lower-case names
      payloadHash: String,
      dateStamp: String, // yyyyMMdd
      region: String,
      service: String,
      accessKey: String,
      secretKey: String): String = {
    val canonicalQuery = query
      .map { case (k, v) => uriEncode(k) -> uriEncode(v) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val sortedHeaders = headers
      .map { case (k, v) => k.toLowerCase -> v.trim }.sortBy(_._1)
    val canonicalHeaders =
      sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sortedHeaders.map(_._1).mkString(";")
    val canonicalRequest = Seq(method, canonicalPath, canonicalQuery,
      canonicalHeaders, signedHeaders, payloadHash).mkString("\n")
    val amzDate = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("x-amz-date") => v
    }.getOrElse(dateStamp)
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      hexSha256(canonicalRequest.getBytes(StandardCharsets.UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes(StandardCharsets.UTF_8),
      dateStamp), region), service), "aws4_request")
    val signature = hmac(kSigning, stringToSign).map(b => f"$b%02x").mkString
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}
