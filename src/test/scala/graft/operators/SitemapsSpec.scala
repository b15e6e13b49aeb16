package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SitemapsSpec extends SparkSpec {

  private def locs(xml: String): Seq[String] = {
    import spark.implicits._
    Seq(Option(xml)).toDF("x")
      .select(Sitemaps.locUrls(col("x")).as("u"))
      .collect().head.getSeq[String](0).toSeq
  }

  test("extracts every <loc>, trimmed, in document order") {
    locs("""<?xml version="1.0"?>
           |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
           |  <url><loc> https://a.com/p1 </loc><lastmod>2026-01-01</lastmod></url>
           |  <url><loc>https://a.com/p2</loc></url>
           |</urlset>""".stripMargin) shouldEqual
      Seq("https://a.com/p1", "https://a.com/p2")
  }

  test("XML entities decode — &amp; in query-string locs is the common case") {
    locs("<url><loc>https://a.com/p?a=1&amp;b=2</loc></url>") shouldEqual
      Seq("https://a.com/p?a=1&b=2")
    // double-escaped &amp;lt; must yield the literal entity, not '<'
    locs("<url><loc>https://a.com/p?q=x&amp;lt;y</loc></url>") shouldEqual
      Seq("https://a.com/p?q=x&lt;y")
  }

  test("pretty-printed locs (URL on its own indented line) trim clean") {
    locs("<url><loc>\n\t https://a.com/p1\n</loc></url>") shouldEqual
      Seq("https://a.com/p1")
  }

  test("non-sitemap, empty, and null input → empty array (explode-safe)") {
    locs("<html>not a sitemap</html>") shouldEqual Seq.empty
    locs("") shouldEqual Seq.empty
    locs(null) shouldEqual Seq.empty
  }

  test("a sitemap index's locs are sitemap URLs — one more hop, same extractor") {
    locs("""<sitemapindex>
           |  <sitemap><loc>https://a.com/sitemap-news.xml</loc></sitemap>
           |</sitemapindex>""".stripMargin) shouldEqual
      Seq("https://a.com/sitemap-news.xml")
  }
}
