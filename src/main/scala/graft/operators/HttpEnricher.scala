package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** O-11 completed for real users: the reference's LLM call
  * (/root/reference/llm_utils.py:137-163) is an HTTP POST of a
  * chat-completions-style JSON body with a 60 s timeout, returning the
  * first choice's message content — and `None` on ANY failure
  * (timeout, transport error, non-200 status, missing content), so a
  * failed enrichment never fails the row or the task (the reference's
  * swallow-and-continue posture, app.py:258-269; the null-skip rows
  * then flow through [[Enrichment.flatten]] as all-null enrichment
  * columns with the base row surviving).
  *
  * Distribution posture: the enricher object is serialized once per
  * task; the HTTP client is `@transient lazy`, so each executor JVM
  * builds exactly one client on first use (the "per-partition lazy
  * client" shape — the reference's strictly sequential loop,
  * app.py:289-300, becomes one in-flight request per partition).
  * NEVER on the verify path: [[Enrichers.fromConf]] returns the
  * deterministic [[MockEnricher]] unless an endpoint is explicitly
  * configured, so oracle runs do no I/O.
  */
object HttpEnricher {

  /** The transport seam: post a JSON body, return (status, body);
    * throw on transport failure (connect error, timeout). Separated
    * from the enricher so failure semantics are unit-testable without
    * a network. */
  trait Transport extends Serializable {
    def post(url: String, headers: Map[String, String], body: String,
        timeoutMs: Long): (Int, String)
  }

  /** JDK built-in client (java.net.http, no extra dependency), via the
    * engine-wide [[graft.Net]] seam (one non-redirecting API instance
    * per executor JVM). */
  object JdkTransport extends Transport {
    def post(url: String, headers: Map[String, String], body: String,
        timeoutMs: Long): (Int, String) = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = graft.Net.api.send(
        b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  @transient private lazy val mapper = new ObjectMapper()

  /** Chat-completions-style request body (llm_utils.py:140-148), built
    * with a real JSON serializer — prompt text with quotes/newlines
    * must not produce a malformed request. */
  private[operators] def requestBody(model: String, prompt: String): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("model", model)
    val msg = root.putArray("messages").addObject()
    msg.put("role", "user")
    msg.put("content", prompt)
    m.writeValueAsString(root)
  }

  /** `choices[0].message.content`, or throw — the reference wraps the
    * same path access in try/except → None (llm_utils.py:155-163). */
  private[operators] def extractContent(responseBody: String): String = {
    val c = mapper.readTree(responseBody)
      .path("choices").path(0).path("message").path("content")
    require(c.isTextual, "response carries no choices[0].message.content")
    c.asText()
  }
}

/** The real [[Enricher]]: POSTs the rendered prompt, 60 s default
  * timeout, null-on-any-failure. Same input skip rule as the mock
  * (no usable about-text → no call at all). */
class HttpEnricher(
    url: String,
    apiKey: String,
    model: String,
    timeoutMs: Long = 60000L,
    transport: HttpEnricher.Transport = HttpEnricher.JdkTransport)
  extends Enricher {

  def enrich(company: String, website: String, about: String): Option[String] =
    if (company == null || about == null || about.isEmpty) None
    else
      scala.util.Try {
        val (status, body) = transport.post(
          url,
          if (apiKey.nonEmpty) Map("Authorization" -> s"Bearer $apiKey") else Map.empty,
          HttpEnricher.requestBody(model,
            Enrichment.prompt(company, website, about)),
          timeoutMs)
        require(status == 200, s"status $status")
        HttpEnricher.extractContent(body)
      }.toOption
}

/** The config gate keeping I/O off the verify path: queries resolve
  * their enricher here, and only an explicit `spark.graft.enricher.url`
  * switches the deterministic mock for the HTTP client. */
object Enrichers {
  def fromConf(spark: SparkSession): Enricher =
    spark.conf.getOption("spark.graft.enricher.url") match {
      case Some(url) =>
        new HttpEnricher(
          url,
          spark.conf.getOption("spark.graft.enricher.apiKey").getOrElse(""),
          spark.conf.getOption("spark.graft.enricher.model").getOrElse("default"),
          spark.conf.getOption("spark.graft.enricher.timeoutMs")
            .map(_.toLong).getOrElse(60000L))
      case None => MockEnricher
    }
}
