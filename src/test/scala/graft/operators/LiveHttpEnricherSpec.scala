package graft.operators

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** HttpEnricher against a LIVE endpoint — a JDK loopback HttpServer, so
  * the REAL java.net.http transport (connection, request write,
  * timeout, status handling) is exercised end-to-end with zero egress.
  * The stubbed-transport tests in HttpEnricherSpec pin failure
  * semantics; this spec pins that the default JdkTransport actually
  * speaks the protocol those stubs assume. */
class LiveHttpEnricherSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val lastBody = new AtomicReference[String]("")
  private val lastAuth = new AtomicReference[String]("")

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def chatJson(content: String): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.putArray("choices").addObject()
      .putObject("message").put("content", content)
    m.writeValueAsString(root)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) => {
      lastBody.set(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      lastAuth.set(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      respond(ex, 200, chatJson("live: enriched"))
    })
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(5000) // longer than the test timeout below
      respond(ex, 200, chatJson("too late"))
    })
    server.createContext("/err", (ex: HttpExchange) => respond(ex, 500, "boom"))
    server.createContext("/badjson", (ex: HttpExchange) => respond(ex, 200, "not json"))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("happy path over a real socket: auth header, JSON body, content extraction") {
    val e = new HttpEnricher(s"$base/ok", apiKey = "sk-test", model = "m1")
    e.enrich("Acme", "https://acme.example", "about \"Acme\"\nline2") shouldEqual
      Some("live: enriched")
    lastAuth.get() shouldEqual "Bearer sk-test"
    // the request body is real JSON carrying the prompt (quotes/newlines intact)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(lastBody.get())
    root.path("model").asText() shouldEqual "m1"
    root.path("messages").path(0).path("content").asText() should include("about \"Acme\"")
  }

  test("a hung endpoint times out to None, not an exception") {
    val e = new HttpEnricher(s"$base/slow", "", "m1", timeoutMs = 300)
    e.enrich("Acme", "w", "about") shouldEqual None
  }

  test("non-200 and malformed-JSON responses both yield None") {
    new HttpEnricher(s"$base/err", "", "m1").enrich("A", "w", "about") shouldEqual None
    new HttpEnricher(s"$base/badjson", "", "m1").enrich("A", "w", "about") shouldEqual None
  }

  test("a connection-refused endpoint yields None (no listener at all)") {
    // an ephemeral port we bound and released — nothing listens there
    val dead = {
      val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val p = s.getAddress.getPort; s.stop(0); p
    }
    new HttpEnricher(s"http://127.0.0.1:$dead/x", "", "m1", timeoutMs = 1000)
      .enrich("A", "w", "about") shouldEqual None
  }

  test("distributed: executors call the live endpoint through enrichMap") {
    import spark.implicits._
    val in = Seq(
      Enrichment.EnrichIn(1L, "Acme", "https://a.example", "about acme"),
      Enrichment.EnrichIn(2L, "Globex", "https://g.example", ""), // skip rule: no call
      Enrichment.EnrichIn(3L, "Initech", "https://i.example", "about initech")
    ).toDS().repartition(3)
    val out = Enrichment.enrichMap(in, new HttpEnricher(s"$base/ok", "", "m1"))
      .collect().sortBy(_.doc_id)
    out.map(r => Option(r.raw_json)).toSeq shouldEqual
      Seq(Some("live: enriched"), None, Some("live: enriched"))
  }
}
