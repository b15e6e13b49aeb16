package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL functions (SURVEY §2.5 F-6/F-7).
  *
  * F-7 (host) is the built-in `parse_url` — codegen'd, no UDF. F-6
  * (urljoin) is the single sanctioned scalar UDF in the engine: RFC-3986
  * reference resolution has no Catalyst built-in. It is null-safe and
  * never throws (malformed input → null, matching the reference's
  * swallow-and-skip error posture, /root/reference/app.py:157-177).
  */
object UrlOps {

  /** F-7: host component, e.g. "https://www.x.com/a" -> "www.x.com". */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  private val resolve: (String, String) => String = (base, href) => {
    if (base == null || href == null) null
    else
      try new java.net.URI(base).resolve(href).toString
      catch { case _: Exception => null }
  }

  /** F-6: absolutize `href` against `base` (Python urljoin semantics for
    * the shapes the reference meets: absolute hrefs pass through,
    * path-absolute and relative hrefs resolve against the base).
    *
    * Declared nondeterministic although the function is pure: it is the
    * one non-codegen expression in the engine, and the optimizer
    * otherwise substitutes it into every consumer — measured TWELVE
    * URI-resolve calls per row in link_topk's physical plan (pushed-down
    * same-domain predicate + the 10 keyword `contains` of the score +
    * the projection). The nondeterministic flag pins it to a single
    * evaluation behind an attribute reference; downstream operators see
    * a plain column either way, and the result is a pure function of
    * the row, so query results are unchanged. */
  val resolveUrl = udf(resolve).asNondeterministic()
}
