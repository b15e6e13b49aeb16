package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeFxSpec extends SparkSpec {
  import QuantizeFx.quantize_fx

  /** The HOF reference semantics the native expression must match on
    * non-null elements (the only kind quantized arrays carry). */
  private def hofQuantize(a: org.apache.spark.sql.Column, s: Double) =
    transform(a, x => floor(x.cast("double") * lit(s)).cast("long"))

  test("matches the HOF form on random float arrays at both family scales") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(Seq.fill(64)(rnd.nextFloat() * 2f - 1f))
    Seq(1e7, 1e4).foreach { s =>
      val df = rows.toDF("a")
        .select(quantize_fx(col("a"), s).as("native"),
          hofQuantize(col("a"), s).as("hof"))
      df.filter(col("native") =!= col("hof")).count() shouldEqual 0
    }
  }

  test("floor semantics on negatives: floor(-0.15·10) = -2, not -1") {
    import spark.implicits._
    val r = Seq(Seq(-0.15f, 0.15f)).toDF("a")
      .select(quantize_fx(col("a"), 10.0)).collect()
    r.head.getSeq[Long](0) shouldEqual Seq(-2L, 1L)
  }

  test("null array → null; output is long-typed and non-null-elemented") {
    import spark.implicits._
    val df = Seq(Some(Seq(0.5f)), None).toDF("a")
      .select(quantize_fx(col("a"), 1e7).as("q"))
    val r = df.collect()
    r(0).getSeq[Long](0) shouldEqual Seq(5000000L)
    r(1).isNullAt(0) shouldEqual true
    import org.apache.spark.sql.types._
    df.schema("q").dataType shouldEqual ArrayType(LongType, containsNull = false)
  }

  test("double arrays quantize too, and interpreted eval matches codegen") {
    import spark.implicits._
    val vals = Seq(Seq(0.1234567d, -0.9999999d))
    val expected = vals.head.map(x => math.floor(x * 1e7).toLong)
    val codegen = vals.toDF("a")
      .select(quantize_fx(col("a"), 1e7)).collect().head.getSeq[Long](0)
    codegen shouldEqual expected
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = vals.toDF("a")
        .select(quantize_fx(col("a"), 1e7)).collect().head.getSeq[Long](0)
      interp shouldEqual expected
    }
  }

  test("the fixed-point envelope fails fast with a contract error, in both eval modes") {
    import spark.implicits._
    import graft.operators.Similarity
    // a corrupted-encoder vector (the r11 adversarial ±1e6 case) must
    // die AT THE SCAN with a named contract message, not 40 stages
    // later as ARITHMETIC_OVERFLOW (Spark/ANSI) vs silent HUGEINT
    // widening (DuckDB) — the engine-divergence class the envelope
    // exists to close
    def run(): Unit =
      Seq(Seq(1e6f)).toDF("a")
        .select(Similarity.quantize(col("a"))).collect()
    val e = intercept[Exception](run())
    val root = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(root.contains("fixed-point envelope"))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val e2 = intercept[Exception](run())
      val root2 = Iterator.iterate(e2: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(root2.contains("fixed-point envelope"))
    }
    // boundary values INSIDE the envelope pass untouched
    val ok = Seq(Seq(Similarity.MaxAbs.toFloat, -Similarity.MaxAbs.toFloat))
      .toDF("a").select(Similarity.quantize(col("a"))).collect().head.getSeq[Long](0)
    ok shouldEqual Seq(
      math.floor(Similarity.MaxAbs.toFloat.toDouble * Similarity.Scale).toLong,
      math.floor(-Similarity.MaxAbs.toFloat.toDouble * Similarity.Scale).toLong)
  }

  test("the branchless envelope's cold-path rescan reports the offending INDEX (r12)") {
    import spark.implicits._
    import graft.operators.Similarity
    // the branchless form accumulates only a violation FLAG in the hot
    // loop (since r13 — two NaN-safe compares, not r12's max(|v|)) and a
    // separate cold rescan names the index — this pins that the rescan
    // finds the right element when the violation is NOT at position 0
    val e = intercept[Exception] {
      Seq(Seq(1.0f, -2.0f, 100.0f, 3.0f)).toDF("a")
        .select(Similarity.quantize(col("a"))).collect()
    }
    val root = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(root.contains("index 2"), s"expected 'index 2' in: $root")
  }

  test("a NaN element cannot mask a later envelope violation (r13, the NaN-safe flag)") {
    import spark.implicits._
    import graft.operators.Similarity
    // r12's max(|v|) accumulator poisoned to NaN on the first NaN and
    // `NaN > maxAbs` is false, so Seq(NaN, 100f) sailed past the
    // envelope and overflowed downstream — the flag form must throw on
    // the 100f in BOTH eval modes, while NaN alone still passes.
    def run(): Unit =
      Seq(Seq(Float.NaN, 100.0f)).toDF("a")
        .select(Similarity.quantize(col("a"))).collect()
    def rootOf(e: Throwable) = Iterator.iterate(e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val root = rootOf(intercept[Exception](run()))
    assert(root.contains("fixed-point envelope") && root.contains("index 1"),
      s"expected envelope error at index 1 in: $root")
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val root2 = rootOf(intercept[Exception](run()))
      assert(root2.contains("fixed-point envelope") && root2.contains("index 1"),
        s"expected envelope error at index 1 in: $root2")
    }
    // a NaN element ALONE keeps the historical pass-through semantics:
    // floor(NaN·s).toLong = 0, no envelope error
    val ok = Seq(Seq(Float.NaN, 1.0f)).toDF("a")
      .select(Similarity.quantize(col("a"))).collect().head.getSeq[Long](0)
    ok shouldEqual Seq(0L, math.floor(1.0f.toDouble * Similarity.Scale).toLong)
  }
}
