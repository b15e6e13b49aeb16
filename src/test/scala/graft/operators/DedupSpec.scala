package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import Dedup._

  private def df(texts: (Int, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("shingles: distinct word n-grams; short docs yield empty set") {
    import spark.implicits._
    val r = Seq("a b c d", "a b", "a b a b a b").toDF("text")
      .select(shingles(split(col("text"), " "), 3).as("ss"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    r(0) shouldEqual Seq("a b c", "b c d")
    r(1) shouldEqual Seq.empty
    r(2) shouldEqual Seq("a b a", "b a b") // distinct despite repetition
  }

  test("jaccard: integer-set formula") {
    import spark.implicits._
    val r = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y").select(jaccard(col("x"), col("y")).as("j"))
      .collect().head.getDouble(0)
    r shouldEqual 0.5 // 2 common / 4 union
  }

  test("minhash signature is identical for identical sets, mostly equal for near-dups") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w40", "w41") // 1 of 38 shingles differs
    val sh = shingled(df(1 -> base, 2 -> base, 3 -> nearDup))
    val sig = sh.select(col("doc_id") +: minhashSig(col("hs")): _*)
      .orderBy("doc_id").collect()
    val s1 = (1 to MinHashK).map(sig(0).getLong)
    val s2 = (1 to MinHashK).map(sig(1).getLong)
    val s3 = (1 to MinHashK).map(sig(2).getLong)
    s1 shouldEqual s2
    s1.zip(s3).count { case (a, b) => a == b } should be >= MinHashK / 2
  }

  test("simhash: identical for identical docs, different for unrelated docs") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine ten"
    val hs = df(1 -> a, 2 -> a, 3 -> b)
      .withColumn("hs", transform(TextAnalysis.tokens(col("text")), t => TextAnalysis.tokenHash(t)))
      .select(col("doc_id"), simhash(col("hs")).as("sh"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    hs(0) shouldEqual hs(1)
    hs(0) should not equal hs(2)
    hs.foreach(h => h should (be >= 0L and be < (1L << SimHashBits)))
  }
}
