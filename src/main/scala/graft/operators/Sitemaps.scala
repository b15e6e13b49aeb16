package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** sitemap.xml URL extraction as pure column expressions — the OTHER
  * standard frontier source beside anchor scanning (sitemaps.org
  * protocol): a crawl pipeline fetches `/sitemap.xml` with
  * [[WebFetch]]/`graft-web` exactly like a page, pulls the `<loc>`
  * entries out here, and feeds them to the robots gate and the
  * politeness scheduler.
  *
  * Deliberately regex-level, not a full XML parser (the same boundary
  * as [[graft.sources.WebTextSource.innerText]]): sitemap files are
  * machine-generated with a fixed tiny vocabulary, so `<loc>` scraping
  * plus XML entity decoding covers the format as served in practice;
  * namespaces, CDATA, and nested sitemap-index recursion stay at the
  * caller (a sitemap INDEX's locs are themselves sitemap URLs — feed
  * them back through one more fetch+extract hop). */
object Sitemaps {

  /** The five XML predefined entities; `&amp;` is genuinely common in
    * sitemap locs (query-string URLs must escape it in XML). Decoded
    * LAST so a literal `&amp;lt;` yields `&lt;`, not `<`. */
  private def decodeXmlEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (e, v)) => regexp_replace(acc, e, v) }
  }

  /** Array of URLs from a sitemap (or sitemap-index) body: every
    * `<loc>…</loc>` text, whitespace-trimmed, XML entities decoded.
    * Null/empty/non-sitemap input → empty array, never null — safe to
    * explode directly after a swallow-and-skip fetch.
    *
    * The trim is regex `\s` (NOT Spark's space-only `trim()`): the
    * `(?s)` flag exists precisely because pretty-printed sitemaps put
    * the URL on its own indented line inside `<loc>`, so the padding
    * to strip is newlines and tabs, which `trim()` leaves intact. */
  def locUrls(xml: Column): Column =
    transform(
      coalesce(regexp_extract_all(xml, lit("(?s)<loc>([^<]*)</loc>"), lit(1)),
        array().cast("array<string>")),
      l => decodeXmlEntities(regexp_replace(l, "^\\s+|\\s+$", "")))
}
