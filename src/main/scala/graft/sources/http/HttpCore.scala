package graft.sources.http

import java.net.URI
import java.net.http.{HttpClient => JHttpClient, HttpRequest, HttpResponse}
import java.nio.charset.{Charset, StandardCharsets}
import java.time.Duration
import java.util.concurrent.ConcurrentHashMap

/** Retry/redirect/timeout policy. Defaults mirror the reference's operational
  * constants (erpl-web `src/include/http_client.hpp:90-97`): 30 s timeout,
  * 3 retries starting at 100 ms with ×4 exponential backoff, 10 redirects.
  */
final case class HttpPolicy(
    timeoutMs: Long = 30000,
    retries: Int = 3,
    retryWaitMs: Long = 100,
    retryBackoff: Double = 4.0,
    maxRedirects: Int = 10,
    cacheTtlMs: Long = 30000,
    cacheMaxEntries: Int = 256)

final case class HttpAuth(
    bearer: Option[String] = None,
    basicUser: Option[String] = None,
    basicPassword: Option[String] = None) {
  def headerValue: Option[String] = bearer.map("Bearer " + _).orElse(
    basicUser.map { u =>
      val raw = u + ":" + basicPassword.getOrElse("")
      "Basic " + java.util.Base64.getEncoder.encodeToString(raw.getBytes(StandardCharsets.UTF_8))
    })
}

final case class HttpResult(
    status: Int,
    url: String,
    headers: Map[String, String],
    contentType: String,
    body: Array[Byte]) {
  /** Sniffed binary decision — magic bytes and body shape first, the
    * Content-Type label second (see [[ContentSniff]]): a PNG served as
    * `text/plain` is binary; a JSON payload served as
    * `application/octet-stream` is text. */
  def isBinary: Boolean = body != null && body.nonEmpty &&
    ContentSniff.isBinary(body, contentType)

  /** Body as UTF-8 text after charset conversion (see [[Charsets]]); binary
    * payloads (sniffed, not just labeled) are returned base64-encoded with
    * the reference's `BINARY_CONTENT_BASE64:` prefix instead of being
    * mis-decoded (erpl-web `src/http_client.cpp:879-889`). */
  def text: String =
    if (isBinary)
      "BINARY_CONTENT_BASE64:" + java.util.Base64.getEncoder.encodeToString(body)
    else Charsets.toUtf8(body, contentType)
}

/** Charset handling per the reference (`src/charset_converter.cpp:7-93`):
  * convert textual payloads to UTF-8 based on the Content-Type charset;
  * ISO-8859-1/-15 and windows-1252 recognized, UTF-8 default; binary
  * content types pass through untouched (callers use `body` directly). */
object Charsets {
  def fromContentType(ct: String): Charset = {
    val lower = Option(ct).getOrElse("").toLowerCase
    val cs = lower.split(';').map(_.trim).find(_.startsWith("charset="))
      .map(_.stripPrefix("charset=").trim.stripPrefix("\"").stripSuffix("\""))
    cs match {
      case Some("iso-8859-1")  => StandardCharsets.ISO_8859_1
      case Some("iso-8859-15") => Charset.forName("ISO-8859-15")
      case Some("windows-1252") | Some("cp1252") => Charset.forName("windows-1252")
      case Some(other) if Charset.isSupported(other) => Charset.forName(other)
      case _ => StandardCharsets.UTF_8
    }
  }
  def toUtf8(body: Array[Byte], contentType: String): String =
    new String(body, fromContentType(contentType))
}

/** Blocking HTTP client with retry/backoff and a TTL response cache for GETs.
  *
  * One instance per JVM-side component (driver planning, or per executor via
  * `@transient lazy val` in partition readers — the client is NOT serialized;
  * connection pooling/keep-alive comes from the underlying
  * `java.net.http.HttpClient`). Sleep schedule matches the reference:
  * wait × backoff^(attempt-1).
  */
class HttpCore(val policy: HttpPolicy = HttpPolicy()) {

  private val client: JHttpClient = JHttpClient.newBuilder()
    .followRedirects(JHttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofMillis(policy.timeoutMs))
    .build()

  private case class CacheEntry(at: Long, result: HttpResult)
  private val cache = new ConcurrentHashMap[String, CacheEntry]()

  def get(url: String, headers: Map[String, String] = Map.empty,
          auth: HttpAuth = HttpAuth(), useCache: Boolean = true): HttpResult = {
    // cache key includes the FULL credential and header values: a URL-only
    // key (or a collidable 32-bit hash of the credentials) could serve one
    // principal's cached body to another within the TTL
    val key = url + "\u0000" + auth.headerValue.getOrElse("") + "\u0000" +
      headers.toSeq.sorted.map { case (k, v) => k + "\u0001" + v }.mkString("\u0000")
    if (useCache) {
      val e = cache.get(key)
      if (e != null && System.currentTimeMillis() - e.at < policy.cacheTtlMs) {
        Trace.trace("http", s"cache hit GET $url")
        return e.result
      }
    }
    val r = request("GET", url, None, headers, auth)
    if (useCache && r.status == 200) {
      evictIfNeeded()
      cache.put(key, CacheEntry(System.currentTimeMillis(), r))
    }
    r
  }

  /** Bounded cache (the reference GCs on a background thread,
    * `http_client.cpp:1123-1196`; inline eviction gives the same bound with
    * no thread): drop expired entries first, then oldest-inserted until under
    * the cap. Round 2 never evicted — the cache grew without bound. */
  private def evictIfNeeded(): Unit = {
    if (cache.size() < policy.cacheMaxEntries) return
    val now = System.currentTimeMillis()
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (now - it.next().getValue.at >= policy.cacheTtlMs) it.remove()
    }
    while (cache.size() >= policy.cacheMaxEntries) {
      // still full of live entries: evict the oldest
      var oldestKey: String = null
      var oldestAt = Long.MaxValue
      cache.forEach { (k, v) => if (v.at < oldestAt) { oldestAt = v.at; oldestKey = k } }
      if (oldestKey == null) return
      cache.remove(oldestKey)
    }
  }

  /** Visible for tests. */
  private[http] def cacheSize: Int = cache.size()

  def request(method: String, url: String, body: Option[(String, String)],
              headers: Map[String, String] = Map.empty,
              auth: HttpAuth = HttpAuth()): HttpResult = {
    var attempt = 0
    var last: Either[Throwable, HttpResult] = Left(new RuntimeException("unsent"))
    while (attempt <= policy.retries) {
      if (attempt > 0) {
        val sleep = (policy.retryWaitMs *
          math.pow(policy.retryBackoff, (attempt - 1).toDouble)).toLong
        Trace.warn("http", s"retry $attempt/${policy.retries} $method $url after ${sleep}ms")
        Thread.sleep(sleep)
      }
      try {
        val t0 = System.nanoTime()
        val r = send(method, url, body, headers, auth)
        Trace.debug("http", s"$method $url -> ${r.status} " +
          s"(${if (r.body == null) 0 else r.body.length} B, ${(System.nanoTime() - t0) / 1000000} ms)")
        // retry server-side errors and 429 throttling; return everything else
        if ((r.status < 500 && r.status != 429) || attempt == policy.retries) return r
        last = Right(r)
      } catch {
        case e: Exception => last = Left(e)
      }
      attempt += 1
    }
    last match {
      case Right(r) => r
      case Left(e) =>
        Trace.error("http", s"$method $url failed after ${policy.retries} retries: ${e.getMessage}")
        throw new RuntimeException(s"HTTP $method $url failed after ${policy.retries} retries", e)
    }
  }

  private def send(method: String, url: String, body: Option[(String, String)],
                   headers: Map[String, String], auth: HttpAuth): HttpResult = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(policy.timeoutMs))
    headers.foreach { case (k, v) => b.header(k, v) }
    auth.headerValue.foreach(v => b.header("Authorization", v))
    body match {
      case Some((content, ct)) =>
        b.header("Content-Type", ct)
        b.method(method, HttpRequest.BodyPublishers.ofString(content))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    val resp: HttpResponse[Array[Byte]] =
      client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    val hs = {
      val m = scala.collection.mutable.Map[String, String]()
      resp.headers().map().forEach((k, vs) => m.put(k.toLowerCase, String.join(", ", vs)))
      m.toMap
    }
    HttpResult(resp.statusCode(), url, hs, hs.getOrElse("content-type", ""), resp.body())
  }
}

object HttpCore {
  /** Per-JVM shared instance (executors re-create it after deserialization —
    * never ship a client over the wire). */
  lazy val shared = new HttpCore()
}
