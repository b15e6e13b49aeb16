package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import TextAnalysis._

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(c.as("v")).collect().head.get(0)
  }
  private def toksOf(text: String) = tokens(norm(col("text")))

  test("fingerprint is order-sensitive and stable") {
    val a = one("alpha beta gamma", fingerprint(toksOf("")))
    val b = one("beta alpha gamma", fingerprint(toksOf("")))
    val a2 = one("alpha beta gamma", fingerprint(toksOf("")))
    a should not equal b
    a shouldEqual a2
    a.asInstanceOf[Long] should (be >= 0L and be < HashMod)
  }

  test("langGuess picks argmax with fixed priority on ties, und on zero hits") {
    one("the cat and the dog", langGuess(toksOf(""))) shouldEqual "en"
    one("el que la vida", langGuess(toksOf(""))) shouldEqual "es"
    // 'la' hits both es and fr equally -> es wins by priority order
    one("la la", langGuess(toksOf(""))) shouldEqual "es"
    one("zzz qqq", langGuess(toksOf(""))) shouldEqual "und"
  }

  test("occurrences counts multiset hits, not set intersection") {
    one("the the a x", occurrences(toksOf(""), Seq("the", "a"))) shouldEqual 3
  }

  test("bpe tokenization splits letter runs, digit runs, single punct") {
    one("ab2 c-d", bpeTokenCount(col("text"))) shouldEqual 5
  }

  test("bpeMergeOnce rewrites every pair occurrence, boundaries included") {
    def merge(text: String): Seq[String] =
      one(text, bpeMergeOnce(toksOf(""), lit("a"), lit("b")))
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    merge("a b") shouldEqual Seq("a_b")
    merge("x a b y") shouldEqual Seq("x", "a_b", "y")
    merge("a b a b") shouldEqual Seq("a_b", "a_b")       // adjacent pairs both merge
    merge("a a b b") shouldEqual Seq("a", "a_b", "b")    // only the true pair
    merge("b a") shouldEqual Seq("b", "a")               // order matters
    merge("a") shouldEqual Seq("a")                      // no partner at the end
    merge("x y z") shouldEqual Seq("x", "y", "z")        // no occurrence
  }

  test("bpeMergeOnce on an empty token array stays empty") {
    import spark.implicits._
    // the unguarded arrays_zip form padded empty toks against the
    // 1-element shifted array and returned [null]
    val r = Seq(Seq.empty[String]).toDF("toks")
      .select(bpeMergeOnce(col("toks"), lit("a"), lit("b")).as("out"))
      .collect().head.getSeq[String](0)
    r shouldEqual Seq.empty
  }

  test("grade bands are right-open at thresholds") {
    import spark.implicits._
    val df = Seq(0.61, 0.6, 0.35, 0.349).toDF("s").select(grade(col("s")).as("g"))
    df.collect().map(_.getString(0)).toSeq shouldEqual Seq("good", "good", "fair", "poor")
  }

  test("bpe tokenization treats unicode letters as letters, not punctuation") {
    import spark.implicits._
    val counts = Seq(("caf\u00e9 \u00fcber", "a1")).toDF("t", "id")
      .select(TextAnalysis.bpeTokenCount(col("t")).as("n"))
      .collect().head.getInt(0)
    counts shouldBe 2 // one token per word, accents included
  }

  test("qualityScore degrades to 0 on an empty token count, never divides by zero") {
    import spark.implicits._
    val sc = Seq(1).toDF("x")
      .select(TextAnalysis.qualityScore(lit(0), lit(0), lit(0)).as("s"))
      .collect().head.getDouble(0)
    sc shouldBe 0.0
  }
}
