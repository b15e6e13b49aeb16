package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductFxSpec extends SparkSpec {
  import DotProductFx.dot_fx

  /** The HOF reference semantics the native expression must match. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("matches the HOF form on random arrays (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(100)((
      Seq.fill(64)(rnd.nextLong() % 1000000L),
      Seq.fill(64)(rnd.nextLong() % 1000000L)))
    val df = rows.toDF("a", "b")
      .select(dot_fx(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
    df.filter(col("native") =!= col("hof")).count() shouldEqual 0
  }

  test("null array → null; null elements count as zero") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq(Some(1L), None, Some(3L)).map(_.getOrElse(0L))), Some(Seq(4L, 5L, 6L)))
    ).toDF("a", "b")
    val r = df.select(dot_fx(col("a"), col("b")).as("d")).collect()
    r(0).isNullAt(0) shouldEqual true
    r(1).getLong(0) shouldEqual (1 * 4 + 0 * 5 + 3 * 6)
  }

  test("length mismatch uses the common prefix (zip_with-with-* semantics)") {
    import spark.implicits._
    val r = Seq((Seq(2L, 3L, 9L), Seq(10L, 10L)))
      .toDF("a", "b").select(dot_fx(col("a"), col("b"))).collect()
    r.head.getLong(0) shouldEqual 50L
  }

  test("survives interpreted (non-codegen) eval too") {
    import spark.implicits._
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val r = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
        .toDF("a", "b").select(dot_fx(col("a"), col("b"))).collect()
      r.head.getLong(0) shouldEqual 32L
    }
  }

}
