package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the reference's link-selection semantics
  * (/root/reference/app.py:33-37,146-193). */
class LinkSelectionSpec extends SparkSpec {
  import LinkSelection._

  test("reference keyword list is exactly app.py:33-37") {
    ReferenceKeywords shouldEqual Seq("about", "company", "corporate", "group",
      "leadership", "management", "investor", "who", "overview", "profile")
  }

  test("F-8 score: +2 per keyword in anchor, +3 per keyword in lowered url") {
    import spark.implicits._
    val r = Seq(
      ("about the company", "https://x.com/ABOUT"),   // anchor: about+company=4; url lower: about=3
      ("nothing here", "https://x.com/blog"),          // 0
      ("investor", "https://x.com/investor-relations") // 2 + 3
    ).toDF("anchor", "url")
      .select(keywordScore(col("anchor"), col("url")).as("s"))
      .collect().map(_.getInt(0)).toSeq
    r shouldEqual Seq(7, 0, 5)
  }

  test("pipeline: null href dropped, off-domain dropped, zero-score dropped, top-k per company") {
    import spark.implicits._
    val cand = Seq(
      ("acme", "https://www.acme.example.com", "/about", "about us"),
      ("acme", "https://www.acme.example.com", "/investor", "investor info"),
      ("acme", "https://www.acme.example.com", "/profile", "profile"),
      ("acme", "https://www.acme.example.com", "/overview", "overview"),   // 4 positive → k=3 keeps 3
      ("acme", "https://www.acme.example.com", "/blog", "news"),           // score 0 → dropped
      ("acme", "https://www.acme.example.com", null, "broken"),            // P-2
      ("acme", "https://www.acme.example.com", "https://other.com/about", "offsite about"), // P-3
      ("beta", "https://www.beta.example.com", "/about", "about")
    ).toDF("company", "website", "href", "anchor_text")
    val out = selectLinks(cand, k = 3).orderBy("company", "rk").collect()
    out.count(_.getString(0) == "acme") shouldEqual 3
    out.count(_.getString(0) == "beta") shouldEqual 1
    out.foreach(r => r.getInt(r.fieldIndex("score")) should be > 0)
    out.foreach(r => r.getString(1) should not include "other.com")
  }

  test("T-3 dedup keeps the best score for a URL seen under several anchors") {
    import spark.implicits._
    val cand = Seq(
      ("acme", "https://www.acme.example.com", "/about", "meaningless"),  // url-only: about=3
      ("acme", "https://www.acme.example.com", "/about", "about company") // 3 + 2 + 2 = 7
    ).toDF("company", "website", "href", "anchor_text")
    val out = selectLinks(cand, k = 3).collect()
    out.length shouldEqual 1
    out.head.getInt(out.head.fieldIndex("score")) shouldEqual 7
  }

  test("dot_fx is callable from SQL via GraftExtensions") {
    spark.sql("SELECT dot_fx(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0) shouldEqual 32L
  }

  test("X-132 canonicalize: each normalization axis, and their composition") {
    import spark.implicits._
    val cases = Seq(
      // host case + default port
      "https://WWW.Acme.Example.COM:443/About" -> "https://www.acme.example.com/About",
      // only the SCHEME'S default port is dropped
      "http://a.com:80/p" -> "http://a.com/p",
      "http://a.com:443/p" -> "http://a.com:443/p",
      "https://a.com:80/p" -> "https://a.com:80/p",
      // path case is PRESERVED (RFC 3986: case-sensitive)
      "https://a.com/CaseSensitive" -> "https://a.com/CaseSensitive",
      // fragment stripped
      "https://a.com/p#section-2" -> "https://a.com/p",
      // tracking params: sole / leading-with-kept-tail / trailing
      "https://a.com/p?utm_source=x" -> "https://a.com/p",
      "https://a.com/p?utm_source=x&page=2" -> "https://a.com/p?page=2",
      "https://a.com/p?page=2&utm_campaign=y&gclid=z" -> "https://a.com/p?page=2",
      // trailing slash, incl. before a query string
      "https://a.com/p/" -> "https://a.com/p",
      "https://a.com/p/?page=2" -> "https://a.com/p?page=2",
      // component scoping: '&'/'=' are legal PATH characters — tracker
      // stripping must not touch them outside the query string
      "https://a.com/a&gclid=x/b" -> "https://a.com/a&gclid=x/b",
      // '?' is legal inside a query VALUE — the path-end slash collapse
      // must not rewrite '/?' sequences there
      "https://a.com/p?next=/dash/?tab=1" -> "https://a.com/p?next=/dash/?tab=1",
      // everything at once
      "HTTPS://B.com:443/Q/?utm_medium=m&page=1&fbclid=f#top"
        -> "https://b.com/Q?page=1",
      // already-canonical input is a fixpoint
      "https://b.com/q?page=1" -> "https://b.com/q?page=1",
      // non-web inputs pass through UNCHANGED (scheme gate): without
      // it these would come out as mangled '://'-prefixed garbage
      // frontier keys that merge unrelated rows
      "mailto:sales@acme.example" -> "mailto:sales@acme.example",
      "ftp://files.acme.example/pub/x" -> "ftp://files.acme.example/pub/x",
      "/relative/path?utm_source=x" -> "/relative/path?utm_source=x",
      "www.acme.example.com/no-scheme" -> "www.acme.example.com/no-scheme")
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    got shouldEqual cases.map(_._2)
  }
}
