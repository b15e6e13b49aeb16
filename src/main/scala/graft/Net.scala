package graft

import java.net.http.HttpClient

/** The engine's JDK HTTP clients, one of each kind per executor JVM,
  * shared by every network seam (the GET fetchers in
  * `graft.sources.WebTextSource` / `graft.operators.WebFetch`, the POST
  * enricher transport in `graft.operators.HttpEnricher`). Construction
  * is centralized so timeout/proxy/TLS configuration changes cannot
  * silently diverge between the GET and POST paths; the two instances
  * stay separate because their redirect policies are intentionally
  * different. `@transient lazy`: object references serialize to tasks,
  * each client is built on first use in each JVM. */
private[graft] object Net {
  private def build(redirect: HttpClient.Redirect): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .followRedirects(redirect)
      .build()

  /** Browser-like page fetching: follows redirects (NORMAL — https
    * downgrade excluded), as a navigation would. */
  @transient lazy val fetching: HttpClient = build(HttpClient.Redirect.NORMAL)

  /** API calls: never auto-redirects (a redirected POST body is a
    * semantic change the caller must see, not a transparent retry). */
  @transient lazy val api: HttpClient = build(HttpClient.Redirect.NEVER)
}
