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

  test("null array → null; a null ELEMENT is null exactly like the HOF form") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Option(1L), Option(2L))), None: Option[Seq[Option[Long]]]),
      (Some(Seq(Option(1L), None, Option(3L))), Some(Seq(Option(4L), Option(5L), Option(6L))))
    ).toDF("a", "b")
    val r = df.select(dot_fx(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    // zip_with's null product poisons the fold: both rows are NULL in
    // BOTH forms — an earlier version coerced the null element to 0,
    // silently diverging from the HOF/oracle semantics on corrupt rows
    r(0).isNullAt(0) shouldEqual true
    r(1).isNullAt(0) shouldEqual true
    r(1).isNullAt(1) shouldEqual true
  }

  test("length mismatch is NULL exactly like the HOF form (zip_with pads with null)") {
    import spark.implicits._
    val r = Seq((Seq(2L, 3L, 9L), Seq(10L, 10L)))
      .toDF("a", "b")
      .select(dot_fx(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof")).collect()
    // an earlier version summed the common prefix (50) — a silent
    // wrong answer on the first truncated vector
    r.head.isNullAt(0) shouldEqual true
    r.head.isNullAt(1) shouldEqual true
  }

  test("quantize_fx and dot_fx are callable from SQL (GraftExtensions registration)") {
    import spark.implicits._
    Seq((Seq(0.5f, 1.5f), Seq(0.25f, 0.75f))).toDF("a", "b")
      .createOrReplaceTempView("dotfx_sql_probe")
    val r = spark.sql(
      """SELECT dot_fx(quantize_fx(a, 1000.0), quantize_fx(b, 1000.0)) AS d
        |FROM dotfx_sql_probe""".stripMargin).collect()
    r.head.getLong(0) shouldEqual (500L * 250L + 1500L * 750L)
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
