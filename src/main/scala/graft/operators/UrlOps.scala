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

  /** X-132: canonical URL form for crawl-frontier / document dedup —
    * the normalization every web-scale pipeline applies before "have we
    * fetched this page already": without it, case-variant hosts,
    * default ports, tracking parameters, fragments, and trailing-slash
    * variants fan one page out into dozens of "distinct" URLs.
    *
    * Steps (order matters):
    *  1. drop the fragment (`#...` — client-side only, never reaches
    *     the server);
    *  2. strip tracking parameters (`utm_*`, `fbclid`, `gclid` — they
    *     address a campaign, not a resource);
    *  3. lowercase the authority (host names are case-insensitive,
    *     RFC 3986 §6.2.2.1) and drop an explicit default port — but
    *     only the SCHEME'S OWN default (`https://h:443`, `http://h:80`,
    *     §6.2.3; `:443` on http addresses a different server and is
    *     kept) — the PATH is left untouched: it is case-SENSITIVE per
    *     the RFC;
    *  4. collapse a trailing slash (`/p1/` ≡ `/p1`, the usual
    *     server-side alias) including before a query string.
    *
    * Pure column expressions — codegen'd, no UDF. Every regex is
    * anchored-or-character-class only (no backreferences, no
    * lookaround) so the identical pattern runs on Java regex here and
    * RE2 in the DuckDB oracle with the same semantics. Scale: a
    * per-row projection chain, embarrassingly parallel.
    *
    * Each rewrite is scoped to the COMPONENT it belongs to — '&' and
    * '=' are legal path characters and '?' is legal inside a query
    * value (RFC 3986 pchar/query), so tracker stripping must see only
    * the query string and slash collapsing only the path, or a path
    * like `/a&gclid=x/b` (or a `?next=/dash/?tab=1` value) would be
    * silently mutated and distinct pages merged. */
  def canonicalize(url: Column): Column = {
    val tracker = "(utm_[a-z_]+|fbclid|gclid)=[^&#]*"
    val noFrag  = regexp_replace(url, "#.*", "")
    // (?i): the scheme is case-insensitive too (HTTPS://… is valid);
    // inline-flag syntax is shared by Java regex and RE2.
    val scheme  = lower(regexp_extract(noFrag, "(?i)^(https?)://", 1))
    val rawAuth = lower(regexp_extract(noFrag, "(?i)^https?://([^/?#]+)", 1))
    // a port is dropped only when it is the SCHEME'S default — :443 on
    // http (or :80 on https) addresses a different server and must stay
    val auth    = when(scheme === "https", regexp_replace(rawAuth, ":443$", ""))
      .otherwise(regexp_replace(rawAuth, ":80$", ""))
    val rest    = regexp_replace(noFrag, "(?i)^https?://[^/?#]+", "")
    // component split: path = up to the first '?', query = the rest
    // (leading '?' included); each normalized in isolation
    val path    = regexp_extract(rest, "^([^?]*)", 1)
    val query   = regexp_replace(rest, "^[^?]*", "")
    // trailing-slash collapse on the PATH only
    val path2   = regexp_replace(path, "/$", "")
    // Tracking-param removal in three backreference-free global passes
    // over the QUERY only, covering every position: (a) '&'-led
    // occurrences (never the first param); (b) the '?'-led occurrence
    // followed by a kept param — the separator promotes to '?'; (c) a
    // '?'-led occurrence at the end. Then a fully-consumed query's
    // lone '?' drops.
    // '?utm_a=1&utm_b=2&page=3' → (a) '?utm_a=1&page=3' → (b) '?page=3'.
    val query2  = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      query, s"&$tracker", ""), s"^\\?$tracker&", "?"), s"^\\?$tracker$$", ""),
      "^\\?$", "")
    // The rewrite only makes sense for web URLs: a scheme-less value, a
    // relative href, or another scheme (mailto:, ftp://) has empty
    // scheme/authority extracts and would come out as a mangled
    // '://'-prefixed string — a garbage frontier key that merges
    // unrelated non-web rows. Gate on the matched scheme and pass
    // everything else through unchanged (null stays null via concat).
    when(scheme =!= "", concat(scheme, lit("://"), auth, path2, query2))
      .otherwise(url)
  }
}
