package graft.sources.http

import graft.testkit.ODataStub
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Retry/backoff + response-cache behavior of the HTTP core (reference
  * policy constants: `http_client.hpp:90-97`, cache `:316-331`). */
class HttpCoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  var stub: ODataStub = _
  override def beforeAll(): Unit = stub = new ODataStub(v2 = false).start()
  override def afterAll(): Unit = if (stub != null) stub.stop()

  test("5xx responses are retried with backoff until success") {
    val http = new HttpCore(HttpPolicy(retries = 3, retryWaitMs = 10))
    val t0 = System.currentTimeMillis()
    val r = http.get(s"http://localhost:${stub.port}/flaky?key=a", useCache = false)
    val elapsed = System.currentTimeMillis() - t0
    assert(r.status == 200 && r.text == "ok after 3")
    // two retries: 10ms + 40ms backoff minimum
    assert(elapsed >= 50, s"expected backoff sleeps, took ${elapsed}ms")
  }

  test("retries exhausted -> last 5xx response is returned") {
    val http = new HttpCore(HttpPolicy(retries = 1, retryWaitMs = 1))
    val r = http.get(s"http://localhost:${stub.port}/flaky?key=b", useCache = false)
    assert(r.status == 503)
  }

  test("GET cache serves within TTL, expires after") {
    val http = new HttpCore(HttpPolicy(cacheTtlMs = 300))
    stub.counterHits = 0
    val url = s"http://localhost:${stub.port}/counter"
    assert(http.get(url).text == "hit 1")
    assert(http.get(url).text == "hit 1") // cached
    assert(stub.counterHits == 1)
    Thread.sleep(350)
    assert(http.get(url).text == "hit 2") // TTL expired
  }

  test("basic auth header is emitted") {
    val r = HttpAuth(basicUser = Some("u"), basicPassword = Some("p"))
    assert(r.headerValue.contains("Basic dTpw"))
  }
}
