package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the reference extraction semantics with literal fixtures — the
  * driver testdata is word-soup with zero pattern hits (verified), so
  * these unit tests are the only place F-1/F-2/F-3 behavior is exercised.
  * Reference: /root/reference/app.py:65-87, index.html:651-686.
  */
class ExtractionSpec extends SparkSpec {
  import spark.implicits._

  private def founded(s: String): Option[String] =
    Seq(s).toDF("t").select(Extraction.extractFounded(col("t")))
      .collect()(0).getString(0) match { case null => None; case v => Some(v) }

  test("F-1 priority order: Founded > Established > Since") {
    // All three present: Founded wins even when it appears last.
    founded("Since 1990. Established in 1995. Founded 1998.") shouldBe Some("Founded 1998")
    founded("Since 1990 and established 2001") shouldBe Some("established 2001")
    founded("around since 1975") shouldBe Some("since 1975")
    founded("no year here") shouldBe None
  }

  test("F-1 returns the WHOLE match (group 0), case-insensitively") {
    founded("FOUNDED IN 2005 in Berlin") shouldBe Some("FOUNDED IN 2005")
    founded("founded  in   1999") shouldBe Some("founded  in   1999") // \s+ allows runs
    founded("refounded 1990") shouldBe Some("founded 1990") // substring match, as the reference
  }

  test("F-2 email: first match, case-sensitive pattern, ''->NULL") {
    val df = Seq(
      ("a", "contact us at Info@Example.COM or sales@x.org"),
      ("b", "no email"),
      ("c", "weird a@b.c1")).toDF("k", "t")
      .select($"k", Extraction.extractEmail($"t").as("e")).orderBy("k")
    df.collect().map(r => Option(r.getString(1))) shouldBe
      Array(Some("Info@Example.COM"), None, Some("a@b.c")) // [a-zA-Z]+ TLD stops at digit
  }

  test("F-3 sentence near keyword: dot-delimited, case-insensitive, trimmed") {
    val df = Seq(
      "Intro. Learn About Us and our mission. Outro.",
      "about usage",          // substring hit — reference behaves the same
      "nothing relevant.").toDF("t")
      .select(Extraction.sentenceNear($"t", "about us").as("s"))
    df.collect().map(r => Option(r.getString(0))) shouldBe Array(
      Some("Learn About Us and our mission"),
      Some("about usage"),
      None)
  }

  test("F-3 regex-quotes the keyword (metacharacters are literal)") {
    val df = Seq("we are 100% c.o (serious). period.").toDF("t")
      .select(Extraction.sentenceNear($"t", "c.o (serious)").as("s"))
    Option(df.collect()(0).getString(0)) shouldBe Some("we are 100% c.o (serious)")
    // ^ dots inside the quoted keyword are literal; the surrounding [^.]*
    //   still stops the sentence at the next unquoted '.'
  }

  test("F-4 whitespace normalize is idempotent and collapses runs") {
    val df = Seq("a\t b\n\nc   d").toDF("t")
      .select(Extraction.normalizeWs($"t").as("n"))
    df.collect()(0).getString(0) shouldBe "a b c d"
    val twice = df.select(Extraction.normalizeWs($"n")).collect()(0).getString(0)
    twice shouldBe "a b c d"
  }

  test("F-5 lower+trim") {
    Seq("  About US ").toDF("t").select(Extraction.normToken($"t"))
      .collect()(0).getString(0) shouldBe "about us"
  }

  test("F-12 truncate with ellipsis only beyond n") {
    val df = Seq("x" * 130, "short").toDF("t")
      .select(Extraction.truncateEllipsis($"t", 120).as("p"))
    val out = df.collect().map(_.getString(0))
    out(0) shouldBe ("x" * 120 + "…")
    out(1) shouldBe "short"
  }

  test("A-3 completeness and status thresholds") {
    val df = Seq(
      (Some("f"), Some("a"), Some("e")),
      (Some("f"), None, None),
      (None, None, None)).toDF("f", "a", "e")
      .withColumn("n", Extraction.completeness(Seq($"f", $"a", $"e")))
      .withColumn("st", Extraction.status($"n", 3))
    df.select("n", "st").collect().map(r => (r.getInt(0), r.getString(1))) shouldBe
      Array((3, "Full"), (1, "Partial"), (0, "Empty"))
  }

  test("K-2 ordered projection null-fills with declared types") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val out = Extraction.orderedProjection(df, Seq("name", "id", "score", "note"),
      Map("score" -> DoubleType))
    out.columns shouldBe Array("name", "id", "score", "note")
    out.schema("score").dataType shouldBe DoubleType
    out.schema("note").dataType shouldBe StringType
    val r = out.collect()(0)
    (r.getString(0), r.getLong(1), r.isNullAt(2), r.isNullAt(3)) shouldBe ("x", 1L, true, true)
  }

  test("F-3 locate form ≡ the reference regex on an exhaustive small-alphabet sweep") {
    // the linear locate+substr implementation must return EXACTLY the
    // group-0 match of the reference's `(?i)[^.]*\Qkw\E[^.]*` for every
    // input — enumerate all strings up to length 7 over an alphabet
    // with the keyword's letters, dots, spaces, and case variants
    // (16k+ cases incl. multi-occurrence, kw-at-edges, adjacent dots)
    val kw = "ab"
    val rx = java.util.regex.Pattern.compile(
      s"(?i)[^.]*${java.util.regex.Pattern.quote(kw)}[^.]*")
    def ref(s: String): Option[String] = {
      val m = rx.matcher(s)
      if (m.find() && m.group(0).nonEmpty) Some(m.group(0).trim) else None
    }
    val alpha = "aAb. "
    val cases = (0 to 7).flatMap { n =>
      (0 until math.pow(alpha.length, n).toInt).map { k =>
        var x = k
        val sb = new StringBuilder
        (0 until n).foreach { _ => sb.append(alpha(x % alpha.length)); x /= alpha.length }
        sb.toString
      }
    }.distinct
    val got = cases.toDF("t")
      .select(Extraction.sentenceNear($"t", kw).as("s"))
      .collect().map(r => Option(r.getString(0)))
    cases.zip(got).foreach { case (c, g) =>
      assert(g == ref(c), s"input ${c.map(ch => if (ch == ' ') '_' else ch)}: got $g, regex says ${ref(c)}")
    }
  }

  test("F-3 a dot-containing keyword keeps its own dots inside the match (regex sweep)") {
    val kw = "a.b"
    val rx = java.util.regex.Pattern.compile(
      s"(?i)[^.]*${java.util.regex.Pattern.quote(kw)}[^.]*")
    def ref(s: String): Option[String] = {
      val m = rx.matcher(s)
      if (m.find() && m.group(0).nonEmpty) Some(m.group(0).trim) else None
    }
    val alpha = "ab. "
    val cases = (0 to 8).flatMap { n =>
      (0 until math.pow(alpha.length, n).toInt).map { k =>
        var x = k
        val sb = new StringBuilder
        (0 until n).foreach { _ => sb.append(alpha(x % alpha.length)); x /= alpha.length }
        sb.toString
      }
    }.distinct
    val got = cases.toDF("t")
      .select(Extraction.sentenceNear($"t", kw).as("s"))
      .collect().map(r => Option(r.getString(0)))
    cases.zip(got).foreach { case (c, g) =>
      assert(g == ref(c), s"input ${c.map(ch => if (ch == ' ') '_' else ch)}: got $g, regex says ${ref(c)}")
    }
  }

  test("F-3 stays linear on a dot-free megadoc (the r11 quadratic-regex regression)") {
    // 2M chars, no '.', no keyword: the literal regex form pinned
    // executors for >700 s here; the locate form must answer in
    // bounded time. Generous wall-clock bound — this is a tripwire
    // against reintroducing a backtracking scan, not a benchmark.
    val mega = ("m" * 7 + " ") * 250000 // 2.0M chars
    val t0 = System.nanoTime()
    val out = Seq(mega, mega + " about us tail").toDF("t")
      .select(Extraction.sentenceNear($"t", "about us").as("s"))
      .collect().map(r => Option(r.getString(0)))
    val secs = (System.nanoTime() - t0) / 1e9
    out(0) shouldBe None
    assert(out(1).get.endsWith("about us tail"))
    assert(secs < 30.0, s"sentenceNear took $secs s on a 2M-char doc — quadratic scan reintroduced?")
  }
}
