package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S-3 as a first-class Spark source: the reference's page fetch
  * (/root/reference/app.py:121-152 — `page.goto` → `inner_text("body")`
  * → anchor extraction) re-expressed as a DataSourceV2 `TableProvider`,
  * so a URL list becomes a DataFrame the rest of the engine's pipeline
  * (F-* extraction, link selection, dedup) consumes like any table:
  *
  * {{{
  * spark.read.format("graft-web")
  *   .option("urls", "https://a.example/,https://b.example/")
  *   .load()                       // url, status, text, links
  * }}}
  *
  * Fidelity boundary, stated honestly: the reference renders with a
  * real browser (JS execution — out of engine scope per SURVEY §2).
  * By default this source speaks plain HTTP and approximates
  * `inner_text` by structural tag stripping
  * ([[WebTextSource.innerText]]); pages that materialize their text
  * with JavaScript come back sparse. The reference's cookie-popup
  * click (O-10, app.py:127-136) has a STATIC analog since round 11:
  * consent/cookie/GDPR overlay subtrees are dropped before text and
  * link extraction ([[WebTextSource.stripConsentOverlays]]), so on the
  * (overwhelmingly common) server-rendered consent banners the
  * extracted text matches the post-click page; only JS-injected
  * banners remain at the render-service boundary. Since round 9 the boundary has a
  * spec'd PROTOCOL, not just a seam: `.option("renderService", url)`
  * routes every fetch through a rendering sidecar speaking
  * [[WebTextSource.RenderServiceFetcher]]'s JSON contract (rendered
  * text + anchors per URL), so deploying a browser pool closes the
  * gap with zero engine changes — WebTextSourceSpec proves the
  * protocol end-to-end against a deterministic loopback renderer.
  *
  * Error posture matches the reference's swallow-and-skip
  * (app.py:258-269): a transport failure yields a row with null
  * status/text, a non-200 yields the status with null text — a dead
  * site never fails the partition, let alone the job.
  *
  * Scale posture: each input partition carries a slice of the URL
  * list (`numPartitions`, default min(8, n)); one fetch in flight per
  * task, one shared JDK HttpClient per executor JVM (`@transient
  * lazy`), which is the reference's strictly-sequential loop
  * parallelized across executors.
  *
  * Crawl governance (r13, the X-133/X-134/X-135 batch gates applied
  * LIVE): `.option("respectRobots", "true")` fetches each host's
  * `/robots.txt` once per task, parses it with the RFC 9309 group
  * model ([[graft.operators.RobotsTxt.groupRulesScala]], pinned
  * against the Catalyst twin), applies longest-match/Allow-wins
  * precedence, and emits a [[RobotsBlockedStatus]] row WITHOUT
  * fetching a disallowed URL (unreachable robots = full disallow,
  * unavailable 4xx = allow, per RFC 9309 §2.3.1).
  * `.option("politenessMs", "500")` enforces a minimum gap between
  * consecutive requests to the same host, robots fetch included.
  * Either option switches the planner to HOST-GROUPED partitions (a
  * host never spans two tasks, so per-host state is partition-local);
  * the reference gets this for free by crawling sequentially
  * (app.py:290) — this is the same guarantee at cluster parallelism. The options-string URL list is the
  * reference's entry shape (a submitted list of sites, thousands at
  * most — app.py's xlsx upload); a 100 TB-scale frontier would not
  * arrive via an option string, and for that shape the engine's
  * mapPartitions enrichment over a URL column (O-9/O-11 recipe) is
  * the documented path — this source is the bounded-list entry point.
  */
object WebTextSource {

  /** `status` value for a URL the source REFUSED to fetch because the
    * host's robots rules disallow it (option `respectRobots`). Not an
    * HTTP status on purpose: the request was never made. Distinct from
    * the null-status transport-error row so a frontier can separate
    * "politely skipped" from "host down". */
  val RobotsBlockedStatus: Int = -1

  val Schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("status", IntegerType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("links", ArrayType(StructType(Seq(
      StructField("href", StringType, nullable = true),
      StructField("anchor", StringType, nullable = true))), containsNull = false),
      nullable = true)))

  /** Transport seam (the [[graft.operators.HttpEnricher.Transport]]
    * pattern): GET a URL, return (status, body); throw on transport
    * failure. Lets specs run the REAL client against a loopback server
    * and a deployment swap in a rendering fetch service. */
  trait Fetcher extends Serializable {
    def get(url: String, timeoutMs: Long): (Int, String)
  }

  /** A fetched page in RENDERED form: HTTP status, the body's inner
    * text, and its (href, anchor) pairs — the unit the reference's
    * browser fetch produces (app.py:121,141: `page.goto` →
    * `inner_text("body")` → `locator("a")`). `text`/`links` are null
    * for non-200 statuses. */
  case class FetchedPage(status: Int, text: String,
      links: Seq[(String, String)])

  /** Page-level fetch seam — what the reader actually consumes. Two
    * shipped impls: [[HttpPageFetcher]] (plain HTTP + structural
    * approximation, the default) and [[RenderServiceFetcher]] (the
    * sidecar render-service protocol, closing the JS-rendering
    * fidelity boundary when a browser pool is deployed). Throw on
    * transport failure → the reader's swallow-and-skip null row. */
  trait PageFetcher extends Serializable {
    def fetchPage(url: String, timeoutMs: Long): FetchedPage
  }

  /** Plain-HTTP page fetch: raw body → [[innerText]] + [[extractLinks]]
    * (JS-materialized text comes back sparse — the documented
    * HTTP-crawler boundary). */
  object HttpPageFetcher extends PageFetcher {
    def fetchPage(url: String, timeoutMs: Long): FetchedPage = {
      val (code, body) = JdkFetcher.get(url, timeoutMs)
      if (code == 200) {
        // strip ONCE so text and links see the same post-"click" DOM —
        // a dismissed banner's links vanish with it in the reference too
        val clean = stripConsentOverlays(body)
        FetchedPage(code, innerText(clean), extractLinks(clean))
      } else FetchedPage(code, null, null)
    }
  }

  /** The render-service protocol: `GET <service>?url=<percent-encoded
    * target>` must answer 200 with JSON
    * `{"status": int, "text": str, "links": [{"href": str, "anchor": str}]}`
    * — the inner text and anchors of the RENDERED DOM (JS executed),
    * produced by a browser pool (Playwright/Chromium sidecar) the
    * engine deliberately does not embed. This carries the reference's
    * render semantics (app.py:121,141) across a process boundary: the
    * engine stays JVM-pure and horizontally scalable, the renderer
    * scales as its own service. A non-200 from the service, malformed
    * JSON, or a missing field throws → the reader's swallow-and-skip
    * error row, so a sick renderer degrades exactly like a dead host.
    * WebTextSourceSpec drives this impl end-to-end against a
    * deterministic loopback service. */
  case class RenderServiceFetcher(serviceUrl: String) extends PageFetcher {
    import RenderServiceFetcher.{Mapper, required}
    def fetchPage(url: String, timeoutMs: Long): FetchedPage = {
      val enc = java.net.URLEncoder.encode(url, "UTF-8")
      val sep = if (serviceUrl.contains("?")) "&" else "?"
      val (code, body) = JdkFetcher.get(s"$serviceUrl${sep}url=$enc", timeoutMs)
      if (code != 200)
        throw new java.io.IOException(s"render service returned $code")
      val root = Mapper.readTree(body)
      val status = required(root, "status").asInt()
      if (status == 200) {
        // a rendered 200 MUST carry text + links — a renderer that
        // answers {"text": null} failed to render and must surface as
        // the error row, never as a page whose content is "" (or the
        // literal string "null", NullNode.asText()'s trap)
        val arr = required(root, "links")
        val links = (0 until arr.size()).map { i =>
          val n = arr.get(i)
          def opt(f: String) = Option(n.get(f)).filter(!_.isNull).map(_.asText())
          (opt("href").orNull, opt("anchor").orNull)
        }.toSeq
        FetchedPage(status, required(root, "text").asText(), links)
      } else FetchedPage(status, null, null)
    }
  }

  object RenderServiceFetcher {
    /** One shared mapper per JVM: ObjectMapper construction builds the
      * (de)serializer factories and caches that exist to be reused, and
      * the instance is thread-safe after configuration — a per-URL
      * allocation in the executor hot loop threw that reuse away. */
    private val Mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    /** The contract's "missing field throws": absent OR JSON-null both
      * count as missing (Jackson hands back a NullNode, whose asText()
      * is the literal string "null" and asInt() a silent 0). */
    private def required(root: com.fasterxml.jackson.databind.JsonNode,
        field: String): com.fasterxml.jackson.databind.JsonNode =
      Option(root.get(field)).filter(!_.isNull).getOrElse(
        throw new java.io.IOException(s"render response missing '$field'"))
  }

  /** JDK built-in client via the engine-wide [[graft.Net]] seam (one
    * browser-like redirect-following instance per executor JVM).
    * The WHOLE exchange is bounded by `timeoutMs`: HttpRequest.timeout
    * only bounds time-to-response-HEADERS, so a slow-loris host that
    * returns 200 and then drips the body one byte a minute would wedge
    * the Spark task forever — sendAsync + a deadline on the future
    * bounds headers AND body together (TimeoutException propagates to
    * the caller's swallow-and-skip error row like any transport
    * failure). */
  object JdkFetcher extends Fetcher {
    def get(url: String, timeoutMs: Long): (Int, String) = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .GET().build()
      val fut = graft.Net.fetching.sendAsync(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      try {
        val resp = fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        (resp.statusCode(), resp.body())
      } catch {
        case e: java.util.concurrent.TimeoutException =>
          fut.cancel(true)
          throw e
        case e: java.util.concurrent.ExecutionException =>
          // unwrap so callers see the same IOException the sync send threw
          throw Option(e.getCause).getOrElse(e)
      }
    }
  }

  // &amp; decodes LAST: a literal "&amp;lt;" on the page renders as
  // "&lt;" in browser inner_text — decoding &amp; first would produce
  // "&lt;" mid-fold and the later pass would double-decode it to "<"
  // (the Sitemaps.decodeXmlEntities rule)
  private val BasicEntities = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  private def decodeEntities(s: String): String =
    BasicEntities.foldLeft(s) { case (acc, (e, c)) => acc.replace(e, c) }

  /** Container tags a consent overlay lives in. Scoped on purpose:
    * stripping, say, a `<body class="cookie-policy-page">` would blank
    * a page ABOUT cookie policy — overlays are div/section/aside/
    * dialog/footer widgets. */
  private val ConsentContainers = Set("div", "section", "aside", "dialog", "footer")

  /** Consent-marker detection over SPLIT class tokens, not an
    * unanchored substring over the whole attribute (r12 advice): each
    * whitespace-separated id/class token is word-split on `-`/`_`/
    * camelCase and marks consent only when a word IS cookie/consent/
    * gdpr — so `cookie-banner`, `GdprConsent`, `consent-wall` match
    * while `bookconsentrations`-style embeddings can't. A negation or
    * pure-reference word vetoes the token: `no-cookie-fallback` is the
    * content shown WITHOUT cookies and `consent-links` is links ABOUT
    * consent — dropping either loses real content, the opposite of the
    * popup-click analog. */
  private val ConsentWord = Set("cookie", "cookies", "consent", "gdpr")
  private val ConsentVeto = Set("no", "non", "not", "without", "link", "links")
  private val WordSplit = "[-_]|(?<=[a-z0-9])(?=[A-Z])"

  private def isConsentToken(tok: String): Boolean = {
    val words = tok.split(WordSplit).iterator.filter(_.nonEmpty)
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSeq
    words.exists(ConsentWord) && !words.exists(ConsentVeto)
  }

  private def marksConsent(attrValue: String): Boolean =
    attrValue.split("\\s+").exists(isConsentToken)

  /** An UNCLOSED overlay would otherwise drop to end-of-document; on
    * real-world HTML (unbalanced markup is routine) that can discard
    * most of a page over one stray banner div. Bound it: when the
    * would-be-dropped tail is both most of the document AND large in
    * absolute terms, fall back to NOT stripping that overlay — a
    * popup's markup is small, so a huge "overlay" is almost certainly
    * a tagging accident, and keeping popup text beats losing the page. */
  private def unclosedDropBound(docLen: Int): Int =
    math.max(docLen / 2, 32 * 1024)
  // one tag, with quoted attr values opaque to '>' (valid HTML)
  private val TagRe =
    "(?is)<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>".r
  private val IdClassRe =
    "(?i)\\b(?:id|class)\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)".r

  /** O-10's static analog: drop consent/cookie/GDPR overlay SUBTREES
    * before text extraction, so the extracted text matches what the
    * reference sees AFTER its popup click (app.py:127-136 clicks
    * "Accept cookies" buttons before `inner_text`; with the popup
    * gone, its text never reaches extraction). A container tag whose
    * id/class mentions cookie|consent|gdpr starts a skipped subtree;
    * nesting of the SAME tag name is tracked so `<div class=consent>
    * <div>…</div></div>` drops exactly the overlay, and an unbalanced
    * overlay (real-world HTML) drops to end-of-document — the same
    * worst case a browser's popup-obscured viewport has. One linear
    * pass, driver/executor-side Scala (no Catalyst involvement). */
  def stripConsentOverlays(html: String): String = {
    // java.lang.StringBuilder: scala's lacks append(CharSequence, from,
    // to) and silently auto-tuples the three arguments into one Any
    val out = new java.lang.StringBuilder(html.length)
    var pos = 0
    var skipTag: String = null
    var skipStart = 0
    var depth = 0
    TagRe.findAllMatchIn(html).foreach { m =>
      val closing = m.group(1).nonEmpty
      val name = m.group(2).toLowerCase
      val attrs = m.group(3)
      if (skipTag == null) {
        val isOverlayStart = !closing && ConsentContainers(name) &&
          !attrs.endsWith("/") && // self-closing containers hold no text
          IdClassRe.findAllMatchIn(attrs).exists(a =>
            marksConsent(a.group(1).stripPrefix("\"").stripSuffix("\"")
              .stripPrefix("'").stripSuffix("'")))
        if (isOverlayStart) {
          out.append(html, pos, m.start)
          skipTag = name; depth = 1
          skipStart = m.start
          pos = m.end
        }
      } else if (name == skipTag) {
        if (closing) {
          depth -= 1
          if (depth == 0) { skipTag = null; pos = m.end }
        } else if (!attrs.endsWith("/")) depth += 1
      }
    }
    if (skipTag == null) out.append(html, pos, html.length)
    else if (html.length - skipStart > unclosedDropBound(html.length))
      // bounded unclosed-overlay drop: restore the whole region rather
      // than discard most of the document over one stray banner tag
      out.append(html, skipStart, html.length)
    out.toString
  }

  /** `inner_text("body")` approximated structurally: consent overlays
    * dropped first (the popup-click analog, [[stripConsentOverlays]]),
    * script/style subtrees dropped (their text is code, not content),
    * block-level closers become line breaks, remaining tags stripped,
    * the common entities decoded, whitespace collapsed per line. Pure
    * function — unit-tested directly, independent of any network. */
  def innerText(html: String): String = {
    val noConsent = stripConsentOverlays(html)
    val noScript = noConsent.replaceAll("(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComment = noScript.replaceAll("(?s)<!--.*?-->", " ")
    val withBreaks = noComment.replaceAll(
      "(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/table|/section|/article)\\b[^>]*>", "\n")
    val noTags = withBreaks.replaceAll("(?s)<[^>]*>", " ")
    decodeEntities(noTags)
      .split("\n")
      .map(_.replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  // href value: double-quoted (may contain '), single-quoted (may
  // contain "), or unquoted (valid HTML — runs to whitespace/'>');
  // driver-side Java regex only, so the quote alternation needs no
  // RE2-compat restrictions
  private val AnchorRe =
    ("(?is)<a\\b[^>]*?href\\s*=\\s*" +
      "(?:\"([^\"]*)\"|'([^']*)'|([^\\s>\"']+))" +
      "[^>]*>(.*?)</a\\s*>").r

  /** Anchor extraction (app.py:146-152: locator("a") → href +
    * inner_text): (href, anchor-text) per `<a>`, anchors cleaned
    * through the same inner-text pass. */
  def extractLinks(html: String): Seq[(String, String)] =
    AnchorRe.findAllMatchIn(html)
      .map { m =>
        val href = Seq(m.group(1), m.group(2), m.group(3))
          .find(_ != null).getOrElse("")
        (href, innerText(m.group(4)))
      }
      .toSeq
}

/** `format("graft-web")` entry point (registered via
  * META-INF/services). */
class WebTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-web"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebTextSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WebTextTable
}

class WebTextTable extends Table with SupportsRead {
  override def name(): String = "graft-web"
  override def schema(): StructType = WebTextSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // ',' is a legal URL character (coordinates, list params) — the
    // 'delimiter' option lets callers pick a byte that cannot occur in
    // their list (e.g. "\n") instead of mangling such URLs
    val delim = Option(options.get("delimiter")).getOrElse(",")
    // fail fast: Pattern.quote("") is a zero-width match that would
    // shred the urls value into single characters
    require(delim.nonEmpty, "graft-web option 'delimiter' must be non-empty")
    new WebTextScan(
      Option(options.get("urls"))
        .map(_.split(java.util.regex.Pattern.quote(delim))
          .map(_.trim).filter(_.nonEmpty))
        .getOrElse(throw new IllegalArgumentException(
          "graft-web requires option 'urls' (delimiter-separated URL list; " +
            "option 'delimiter' defaults to ',')")),
      Option(options.get("numPartitions")).map(_.toInt).getOrElse(0),
      Option(options.get("timeoutMs")).map(_.toLong).getOrElse(30000L),
      // option 'renderService': base URL of a rendering fetch service
      // (the RenderServiceFetcher protocol); absent → plain HTTP
      Option(options.get("renderService"))
        .map(WebTextSource.RenderServiceFetcher(_): WebTextSource.PageFetcher)
        .getOrElse(WebTextSource.HttpPageFetcher),
      // crawl governance (r13): 'respectRobots' fetches + applies each
      // host's robots.txt before any page on it (RFC 9309 group model
      // + Allow precedence — the X-133/X-135 batch gates applied LIVE);
      // 'politenessMs' spaces consecutive requests to the SAME host.
      // Either option switches partition planning to host-grouped so
      // per-host serialization is a partition-local property.
      Option(options.get("respectRobots")).exists(_.trim.toBoolean),
      Option(options.get("politenessMs")).map(_.toLong).getOrElse(0L))
  }
}

class WebTextScan(urls: Array[String], numPartitions: Int, timeoutMs: Long,
    fetcher: WebTextSource.PageFetcher,
    respectRobots: Boolean = false, politenessMs: Long = 0L)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = WebTextSource.Schema
  override def toBatch: Batch = this

  private def governed: Boolean = respectRobots || politenessMs > 0

  override def planInputPartitions(): Array[InputPartition] = {
    if (governed) {
      // HOST-GROUPED planning: per-host serialization (politeness) and
      // the one-robots-fetch-per-host cache are partition-local
      // properties only if a host never spans two tasks. Hosts are
      // spread round-robin by first appearance; within a partition the
      // original URL order is kept, so a task interleaves its hosts
      // and fetches one host's page while another host's politeness
      // window elapses. (The reference crawls strictly sequentially —
      // accidental politeness; this is the scale-correct form: full
      // parallelism ACROSS hosts, serial WITHIN one.)
      val hostOf = urls.map { u =>
        u -> (try Option(java.net.URI.create(u).getAuthority)
          .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse(u)
        catch { case _: IllegalArgumentException => u })
      }.toMap
      val hosts = urls.map(hostOf).distinct
      val n = math.max(1,
        if (numPartitions > 0) math.min(numPartitions, hosts.length)
        else math.min(8, hosts.length))
      val slot = hosts.zipWithIndex.map { case (h, i) => h -> i % n }.toMap
      (0 until n).map(i =>
        UrlsPartition(urls.filter(u => slot(hostOf(u)) == i))
          : InputPartition).filter(
        _.asInstanceOf[UrlsPartition].urls.nonEmpty).toArray
    } else {
      val n = math.max(1,
        if (numPartitions > 0) math.min(numPartitions, urls.length)
        else math.min(8, urls.length))
      // round-robin, not contiguous slices: submitted lists are often
      // grouped by site, and contiguous slicing would hand one slow
      // site's every page to a single straggler task
      (0 until n).map(i =>
        UrlsPartition(urls.zipWithIndex.collect {
          case (u, j) if j % n == i => u
        }): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WebTextReaderFactory(timeoutMs, fetcher, respectRobots, politenessMs)
}

case class UrlsPartition(urls: Array[String]) extends InputPartition

class WebTextReaderFactory(timeoutMs: Long,
    fetcher: WebTextSource.PageFetcher,
    respectRobots: Boolean = false, politenessMs: Long = 0L)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WebTextReader(partition.asInstanceOf[UrlsPartition].urls, timeoutMs,
      fetcher, respectRobots, politenessMs)
}

class WebTextReader(urls: Array[String], timeoutMs: Long,
    fetcher: WebTextSource.PageFetcher = WebTextSource.HttpPageFetcher,
    respectRobots: Boolean = false, politenessMs: Long = 0L)
    extends PartitionReader[InternalRow] {
  private var i = -1
  private var row: InternalRow = _

  // ── crawl governance (r13): per-host robots cache + request spacing.
  // Host-grouped planning guarantees a host never spans two tasks, so
  // partition-local state IS per-host state. ──
  // None = robots UNREACHABLE (5xx/transport): full disallow per
  // RFC 9309 §2.3.1.4 — a host whose governance can't be read is not
  // crawled. Unavailable (4xx) = allow all (§2.3.1.3).
  private val robotsCache =
    scala.collection.mutable.Map[String, Option[Seq[(Boolean, String)]]]()
  private val lastHit = scala.collection.mutable.Map[String, Long]()

  private def authorityOf(url: String): Option[(String, String)] =
    try {
      val u = java.net.URI.create(url)
      for (a <- Option(u.getAuthority); s <- Option(u.getScheme))
        yield (s, a.toLowerCase(java.util.Locale.ROOT))
    } catch { case _: IllegalArgumentException => None }

  private def pathOf(url: String): String =
    try Option(java.net.URI.create(url).getRawPath).filter(_.nonEmpty)
      .getOrElse("/")
    catch { case _: IllegalArgumentException => "/" }

  /** Sleep out the remainder of the host's politeness window (no-op
    * when politenessMs is 0). Applies to EVERY request to the host,
    * including the robots.txt fetch itself. */
  private def politeWait(host: String): Unit = if (politenessMs > 0) {
    lastHit.get(host).foreach { t =>
      val remainMs = politenessMs - (System.nanoTime() - t) / 1000000L
      if (remainMs > 0) Thread.sleep(remainMs)
    }
  }
  private def recordHit(host: String): Unit =
    if (politenessMs > 0) lastHit(host) = System.nanoTime()

  /** Robots rules for a host, fetched ONCE per (host, partition) and
    * cached; politeness spacing covers the fetch. */
  private def robotsFor(scheme: String, auth: String): Option[Seq[(Boolean, String)]] =
    robotsCache.getOrElseUpdate(auth, {
      politeWait(auth)
      try {
        val (code, body) =
          WebTextSource.JdkFetcher.get(s"$scheme://$auth/robots.txt", timeoutMs)
        if (code == 200) Some(graft.operators.RobotsTxt.groupRulesScala(body))
        else if (code >= 400 && code < 500) Some(Seq.empty) // allow all
        else None // server error → unreachable → full disallow
      } catch {
        case ie: InterruptedException => throw ie
        case _: Exception => None // transport failure → full disallow
      } finally recordHit(auth)
    })

  /** False only when governance says DON'T fetch: robots disallow the
    * path, or robots themselves are unreachable. URLs without a
    * parseable scheme+authority skip governance (their fetch fails into
    * the transport-error row anyway). */
  private def allowedByRobots(url: String): Boolean =
    !respectRobots || (authorityOf(url) match {
      case Some((scheme, auth)) => robotsFor(scheme, auth) match {
        case Some(rules) =>
          graft.operators.RobotsTxt.isAllowed(rules, pathOf(url))
        case None => false
      }
      case None => true
    })

  // the fetch happens in next(), not get(): the PartitionReader
  // contract allows get() to be called repeatedly per advance and
  // requires it to return the same row — a fetch in get() would re-hit
  // the network and could return a DIFFERENT row the second time
  override def next(): Boolean = {
    i += 1
    if (i >= urls.length) return false
    val url = urls(i)
    // plain Tuple3[Any, ...] access, NOT a destructuring val: a typed
    // pattern (`val (s: Any, …) = t`) is a runtime type TEST, and null
    // fails it — the error row itself would MatchError
    val fetched: (Any, Any, Any) =
      if (!allowedByRobots(url))
        // governance row: never fetched (RobotsBlockedStatus, not an
        // HTTP status) — the live form of the X-133/X-135 gates
        (WebTextSource.RobotsBlockedStatus, null, null)
      else try {
        val hostKey = authorityOf(url).map(_._2)
        hostKey.foreach(politeWait)
        try {
          val page = fetcher.fetchPage(url, timeoutMs)
          if (page.text != null)
            (page.status,
              UTF8String.fromString(page.text),
              new GenericArrayData(page.links.map {
                case (href, anchor) => InternalRow(
                  UTF8String.fromString(href), UTF8String.fromString(anchor))
              }.toArray[Any]))
          else (page.status, null, null)
        } finally hostKey.foreach(recordHit)
      } catch {
        // task cancellation arrives as Thread.interrupt() →
        // InterruptedException out of HttpClient.send; swallowing it
        // would keep a KILLED task fetching its remaining URLs
        case ie: InterruptedException => throw ie
        // transport failure (connect refused, timeout, bad host):
        // null status/text — the row survives, the task never fails
        case _: Exception => (null, null, null)
      }
    row = InternalRow(UTF8String.fromString(url),
      fetched._1, fetched._2, fetched._3)
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit = ()
}
