package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import Similarity._

  private def row(a: Seq[Float], b: Seq[Float]) = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(quantize(col("a")).as("qa"), quantize(col("b")).as("qb"))
      .withColumn("dot", dotFx(col("qa"), col("qb")))
      .withColumn("na", dotFx(col("qa"), col("qa")))
      .withColumn("nb", dotFx(col("qb"), col("qb")))
      .withColumn("cos", cosFx(col("dot"), col("na"), col("nb")))
      .collect().head
  }

  test("quantize floors at 1e7 scale, negative values round toward -inf") {
    import spark.implicits._
    val q = Seq(Seq(0.5f, -0.25f, 0.0f)).toDF("a")
      .select(quantize(col("a")).as("q")).collect().head.getSeq[Long](0)
    q shouldEqual Seq(5000000L, -2500000L, 0L)
  }

  test("cosine of identical vectors is 1, of orthogonal vectors 0") {
    val r1 = row(Seq(0.3f, 0.4f), Seq(0.3f, 0.4f))
    r1.getAs[Double]("cos") shouldEqual 1.0 +- 1e-12
    val r2 = row(Seq(1f, 0f), Seq(0f, 1f))
    r2.getAs[Double]("cos") shouldEqual 0.0
    r2.getAs[Long]("dot") shouldEqual 0L
  }

  test("dot product is exact integer arithmetic") {
    val r = row(Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))
    // floor of float32(0.1)*1e7 etc: 0.1f = 0.100000001490116...
    r.getAs[Long]("na") should be > 0L
    r.getAs[Long]("dot") shouldEqual {
      val q = (x: Float) => math.floor(x.toDouble * 1e7).toLong
      q(0.1f) * q(0.3f) + q(0.2f) * q(0.4f)
    }
  }

  test("signBucket packs non-negative dimensions into bits") {
    import spark.implicits._
    val b = Seq(Seq(1f, -1f, 0f, -1f)).toDF("a")
      .select(signBucket(col("a"), 4).as("b")).collect().head.getLong(0)
    b shouldEqual (1L | 4L) // dims 0 and 2 non-negative
  }

  test("zero-norm vectors yield null cosine, not an ANSI divide-by-zero crash") {
    import spark.implicits._
    val out = Seq((Seq(0f, 0f), Seq(1f, 0f))).toDF("a", "b")
      .select(Similarity.cosFx(
        Similarity.dotFx(Similarity.quantize(col("a")), Similarity.quantize(col("b"))),
        Similarity.dotFx(Similarity.quantize(col("a")), Similarity.quantize(col("a"))),
        Similarity.dotFx(Similarity.quantize(col("b")), Similarity.quantize(col("b"))))
        .as("cos"))
      .collect().head
    out.isNullAt(0) shouldBe true
  }

  test("signBucket hashes a too-short vector instead of throwing under ANSI") {
    import spark.implicits._
    val b = Seq(Seq(1L)).toDF("q") // 1 element, 6 bits requested
      .select(Similarity.signBucket(col("q"), 6).as("b"))
      .collect().head.getLong(0)
    b shouldBe 1L // present dim 0 is >= 0; missing dims hash to 0
  }
}
