package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.Row

/** S-3's last mile (r12 item #5): the render-service protocol driven
  * CROSS-PROCESS. [[RenderService]] is launched as its OWN JVM via
  * ProcessBuilder and `spark.read.format("graft-web")
  * .option("renderService", …)` talks to it over a real socket — so
  * the JSON contract, the consent-strip popup analog, and the error
  * posture are proven to survive a process boundary exactly as they
  * must when the service is a deployed Playwright/Chromium pool
  * (OPERATIONS.md §render-service). The in-process loopback tests in
  * WebTextSourceSpec stay as the fast contract matrix; this suite is
  * the deployment-shaped integration proof. */
class RenderServiceITSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private var target: HttpServer = _
  private var targetBase: String = _
  private var proc: Process = _
  private var servicePort: Int = -1

  private val page =
    """<html><body>
      |<div id="cookie-banner">We use cookies! <a href="/cookie-policy">policy</a></div>
      |<h1>Acme &amp; Sons</h1>
      |<p>Founded in 1999.</p>
      |<a href="/about">About Us</a>
      |</body></html>""".stripMargin

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    // the "web site" the render service fetches
    target = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    target.createContext("/page", (ex: HttpExchange) => respond(ex, 200, page))
    target.createContext("/gone", (ex: HttpExchange) => respond(ex, 404, "nope"))
    target.start()
    targetBase = s"http://127.0.0.1:${target.getAddress.getPort}"

    // the render service, in its OWN JVM (ephemeral port, parsed from
    // the READY line — the launch contract a supervisor uses too)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    proc = new ProcessBuilder(javaBin, "-cp", cp, "graft.sources.RenderService", "0")
      .redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var line: String = null
    while (servicePort < 0 && System.nanoTime() < deadline &&
        { line = reader.readLine(); line != null }) {
      val m = "RENDER_SERVICE_READY port=(\\d+)".r.findFirstMatchIn(line)
      m.foreach(g => servicePort = g.group(1).toInt)
    }
    require(servicePort > 0, "render service process never became ready")
  }

  override def afterAll(): Unit = {
    if (proc != null) proc.destroyForcibly()
    if (target != null) target.stop(0)
    super.afterAll()
  }

  private def renderUrl = s"http://127.0.0.1:$servicePort/render"

  test("cross-process render: text + links arrive, consent overlay stripped") {
    val row = spark.read.format("graft-web")
      .option("urls", s"$targetBase/page").option("timeoutMs", "10000")
      .option("renderService", renderUrl)
      .load().collect().head
    row.getInt(1) shouldEqual 200
    val text = row.getString(2)
    text should include("Acme & Sons")
    text should include("Founded in 1999.")
    // the popup-click analog crossed the process boundary too: the
    // banner's text AND its links vanish from the rendered payload
    text should not include "cookies"
    row.getSeq[Row](3).map(r => (r.getString(0), r.getString(1))) shouldEqual
      Seq(("/about", "About Us"))
  }

  test("cross-process render: the target's HTTP error is the row's status") {
    val row = spark.read.format("graft-web")
      .option("urls", s"$targetBase/gone").option("timeoutMs", "10000")
      .option("renderService", renderUrl)
      .load().collect().head
    row.getInt(1) shouldEqual 404
    assert(row.isNullAt(2) && row.isNullAt(3))
  }

  test("cross-process render: a dead target host is a 502 from the service = error row") {
    val row = spark.read.format("graft-web")
      .option("urls", "http://127.0.0.1:1/x").option("timeoutMs", "10000")
      .option("renderService", renderUrl)
      .load().collect().head
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("a killed render service degrades like a dead host: error rows, no task failure") {
    // a second service instance, killed before the read — the engine
    // must degrade to the swallow-and-skip row, never a job failure
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val p2 = new ProcessBuilder(javaBin, "-cp", cp, "graft.sources.RenderService", "0")
      .redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(p2.getInputStream, "UTF-8"))
    var port2 = -1
    var line: String = null
    while (port2 < 0 && { line = reader.readLine(); line != null }) {
      val m = "RENDER_SERVICE_READY port=(\\d+)".r.findFirstMatchIn(line)
      m.foreach(g => port2 = g.group(1).toInt)
    }
    require(port2 > 0)
    p2.destroyForcibly()
    p2.waitFor()
    val row = spark.read.format("graft-web")
      .option("urls", s"$targetBase/page").option("timeoutMs", "5000")
      .option("renderService", s"http://127.0.0.1:$port2/render")
      .load().collect().head
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("healthz answers from the external process") {
    val (code, body) = WebTextSource.JdkFetcher.get(
      s"http://127.0.0.1:$servicePort/healthz", 5000)
    code shouldEqual 200
    body should include("ok")
  }
}
