package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Quantile

/** Two-phase exact rank selection (X-47/X-53 scale fix): the histogram-
  * bucketed plan must agree row-for-row with the naive one-window rank
  * selection it replaces, including on degenerate groups the histogram
  * math could mishandle (single-row groups, all-equal-value groups,
  * values landing exactly on bucket boundaries). */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random mix (no Math.random in specs). */
  private def mix(i: Int): Double = ((i * 2654435761L) % 10007L).toDouble / 7.0

  private lazy val df: DataFrame = {
    val rows =
      (1 to 997).map(i => (s"g${i % 7}", mix(i), i.toLong)) ++      // 7 mid-size groups
      Seq(("single", 42.0, 10001L)) ++                              // n = 1
      (1 to 9).map(i => ("flat", 5.0, 10100L + i)) ++               // hi == lo
      (1 to 64).map(i => ("grid", (i % 8).toDouble, 10200L + i))    // heavy value ties
    rows.toDF("g", "v", "k").repartition(8)
  }

  private def naiveRanks(ranks: Long => Seq[Long]): Set[(String, Long)] = {
    val byG = Window.partitionBy("g")
    val w = byG.orderBy(col("v"), col("k"))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(byG))
      .collect()
      .filter(r => ranks(r.getAs[Long]("n")).contains(r.getAs[Long]("rn")))
      .map(r => (r.getString(0), r.getAs[Long]("k"))).toSet
  }

  test("selectRanks matches the naive window for median ranks on every group shape") {
    val got = Quantile.selectRanks(df, "g", "v", "k",
        n => Seq(Quantile.idiv(n + lit(1L), 2), Quantile.idiv(n + lit(2L), 2)))
      .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    got shouldEqual naiveRanks(n => Seq((n + 1) / 2, (n + 2) / 2).distinct)
  }

  test("selectRanks matches the naive window for min, p90 and max ranks") {
    val got = Quantile.selectRanks(df, "g", "v", "k",
        n => Seq(lit(1L), Quantile.idiv(n * lit(9L) + lit(9L), 10), n))
      .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    got shouldEqual naiveRanks(n => Seq(1L, (9 * n + 9) / 10, n).distinct)
  }

  test("selected rows carry the exact global rank and group count") {
    val out = Quantile.selectRanks(df.filter(col("g") === "grid"), "g", "v", "k",
        n => Seq(lit(17L)))
      .select("__n", "__grank", "k").collect()
    out.length shouldEqual 1
    out.head.getLong(0) shouldEqual 64L
    out.head.getLong(1) shouldEqual 17L
    // rank 17 of 64 under (v = i%8, tiebreak k): values 0..7 each ×8;
    // rank 17 is the first k in the third value class (v=2 → i∈{2,10,…})
    out.head.getLong(2) shouldEqual 10202L
  }

  test("null values are excluded like SQL aggregates — ranks run over the non-null domain") {
    // before the fix, stats min/max skipped nulls while count(*) kept
    // them and the null bucket expression fell through `least` to the
    // LAST bucket (rank order puts nulls FIRST) — every cumulative
    // count in a null-bearing group was misaligned
    val d = Seq(
      ("n", Some(10.0), 1L), ("n", None, 2L), ("n", Some(20.0), 3L),
      ("n", None, 4L), ("n", Some(30.0), 5L),
      ("allnull", None, 6L), ("allnull", None, 7L)).toDF("g", "v", "k")
    val got = Quantile.selectRanks(d, "g", "v", "k",
        n => Seq(Quantile.idiv(n + lit(1L), 2), Quantile.idiv(n + lit(2L), 2)))
      .select("g", "k", "__n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // 3 non-null values -> n = 3, median rank 2 -> v = 20 (k = 3);
    // the all-null group has no quantiles at all (SQL NULL)
    got shouldEqual Seq(("n", 3L, 3L))
  }

  test("long domains wider than Long.MaxValue bucket without overflow") {
    // the group range 2·(Long.MaxValue/2) + 4 overflows a long
    // subtraction (ANSI mode throws; legacy wraps non-monotone) — the
    // double-cast bucket expression must still select the exact median
    val big = Long.MaxValue / 2
    val d = Seq(("w", -big - 2L, 1L), ("w", -big, 2L), ("w", 0L, 3L),
      ("w", big, 4L), ("w", big + 2L, 5L)).toDF("g", "v", "k")
    val got = Quantile.selectRanks(d, "g", "v", "k",
        n => Seq(Quantile.idiv(n + lit(1L), 2)))
      .select("k").collect().map(_.getLong(0)).toSeq
    got shouldEqual Seq(3L)
  }

  test("ntile cutoffs + boundary compare reproduce Spark's ntile exactly") {
    // quartile via the broadcast-compare shape used by customer_quartiles
    val cuts = Quantile.selectRanks(df, "g", "v", "k", Quantile.ntileCutoffs(4))
      .groupBy("g")
      .agg(collect_set(struct(col("v").as("bv"), col("k").as("bk"))).as("cuts"))
    val emulated = df.join(broadcast(cuts), "g")
      .withColumn("tile", (lit(1) + org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(col("cuts"),
          (b: org.apache.spark.sql.Column) =>
            b("bv") < col("v") || (b("bv") === col("v") && b("bk") < col("k")))))
        .cast("int"))
      .select("g", "k", "tile").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val real = df.withColumn("tile",
        ntile(4).over(Window.partitionBy("g").orderBy(col("v"), col("k"))))
      .select("g", "k", "tile").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    emulated shouldEqual real
  }

  test("second histogram level: pathological single-bucket mass stays exact") {
    // Three group shapes that force the Level2Threshold split to take
    // BOTH branches in one plan:
    //  - "path": 5000 dense values in [0, ~7) plus one outlier at 1e9.
    //    Level-1 bucket width ≈ 1e6, so all dense mass collapses into
    //    bucket 0 (5000 > Level2Threshold = 4096) → second level must
    //    re-spread over the actual [0,7) range and stay exact.
    //  - "ties": 5000 copies of ONE value — the oversized bucket cannot
    //    be value-separated at any level; the tiebreak-ordered floor
    //    must still pick the exact rows.
    //  - "norm": a well-shaped group that takes the direct branch, so
    //    the union of both branches is what's checked.
    val rows =
      (1 to 5000).map(i => ("path", mix(i) / 205.0, i.toLong)) ++
      Seq(("path", 1e9, 90001L)) ++
      (1 to 5000).map(i => ("ties", 5.0, 20000L + i)) ++
      (1 to 500).map(i => ("norm", mix(i), 40000L + i))
    val patho = rows.toDF("g", "v", "k").repartition(8)

    val byG = Window.partitionBy("g")
    val w = byG.orderBy(col("v"), col("k"))
    def naive(ranks: Long => Seq[Long]): Set[(String, Long)] =
      patho.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(byG))
        .collect()
        .filter(r => ranks(r.getAs[Long]("n")).contains(r.getAs[Long]("rn")))
        .map(r => (r.getString(0), r.getAs[Long]("k"))).toSet

    val got = Quantile.selectRanks(patho, "g", "v", "k",
        n => Seq(Quantile.idiv(n + lit(1L), 2), Quantile.idiv(n * lit(9L) + lit(9L), 10), n))
      .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    got shouldEqual naive(n => Seq((n + 1) / 2, (9 * n + 9) / 10, n).distinct)
  }

  test("cascaded concentration descends a further histogram level and stays exact") {
    // Doubly-pathological shape: dense mass PLUS an edge point at TWO
    // scales, so the first refinement level re-collapses — 4900 values
    // in [0, 1e-9) and 100 in [1e-4, 1e-3) under a 1e9 outlier.
    // Level 1: everything below the outlier lands in bucket 0
    // (5000 > 4096). Level 2 over [0, ~1e-3): sub-bucket width ≈ 1e-6,
    // the 4900 tiny values re-collapse into sub-bucket 0 (4900 > 4096)
    // — the level-2-and-stop shape would rank that near-group-size
    // partition in one task; the re-gated loop must descend once more
    // and still select the exact rows (median rank 2501 sits inside
    // the re-collapsed mass by construction).
    val rows =
      (0 until 4900).map(i => ("g", i * 2e-13, i.toLong)) ++
      (0 until 100).map(i => ("g", 1e-4 + i * 9e-6, 10000L + i)) ++
      Seq(("g", 1e9, 90001L))
    val casc = rows.toDF("g", "v", "k").repartition(8)
    val byG = Window.partitionBy("g")
    val w = byG.orderBy(col("v"), col("k"))
    val naive = casc.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(byG))
      .collect()
      .filter { r =>
        val n = r.getAs[Long]("n")
        Seq((n + 1) / 2, (9 * n + 9) / 10, n).contains(r.getAs[Long]("rn"))
      }
      .map(r => (r.getString(0), r.getAs[Long]("k"))).toSet
    val got = Quantile.selectRanks(casc, "g", "v", "k",
        n => Seq(Quantile.idiv(n + lit(1L), 2), Quantile.idiv(n * lit(9L) + lit(9L), 10), n))
      .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    got shouldEqual naive
  }

  test("refinement keys survive group values containing the old delimiter") {
    // The loop used to key refinement state on concat_ws(U+0001,
    // group, bucketIds...) — a group value containing U+0001 followed
    // by digits could in principle align with another group's path.
    // State is now keyed on the PAIR (raw group column, digit-path),
    // which cannot collide; this pins exactness for hostile group
    // names driven through MULTIPLE refinement levels (the cascaded
    // fixture shape, duplicated across three adversarially-named
    // groups incl. a prefix pair "q" / "q<SEP>1")..
    def block(g: String, base: Long) =
      (0 until 4900).map(i => (g, i * 2e-13, base + i)) ++
      (0 until 100).map(i => (g, 1e-4 + i * 9e-6, base + 10000L + i)) ++
      Seq((g, 1e9, base + 90001L))
    val rows = block("q", 0L) ++ block("q\u00011", 100000L) ++
      block("q\u00011\u00012", 200000L)
    val hostile = rows.toDF("g", "v", "k").repartition(8)
    val byG = Window.partitionBy("g")
    val w = byG.orderBy(col("v"), col("k"))
    val naive = hostile.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(byG))
      .collect()
      .filter { r =>
        val n = r.getAs[Long]("n")
        Seq((n + 1) / 2, (9 * n + 9) / 10, n).contains(r.getAs[Long]("rn"))
      }
      .map(r => (r.getString(0), r.getAs[Long]("k"))).toSet
    val got = Quantile.selectRanks(hostile, "g", "v", "k",
        n => Seq(Quantile.idiv(n + lit(1L), 2), Quantile.idiv(n * lit(9L) + lit(9L), 10), n))
      .select("g", "k").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    got shouldEqual naive
  }

  test("winsorized_mean matches a naive sort-and-clip reference") {
    val rows = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderpriority", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact, r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.map { case (p, vs) =>
      val sorted = vs.sortBy(v => (v._2, v._3)).map(_._2)
      val n = sorted.length
      val lo = sorted((n + 19) / 20 - 1)
      val hi = sorted((n * 19 + 19) / 20 - 1)
      val win = sorted.map(c => math.min(math.max(c, lo), hi)).sum
      (p, n.toLong, lo, hi,
        win.toDouble / n / 100.0, sorted.sum.toDouble / n / 100.0)
    }.sortBy(_._1)
    val got = SparkEntry.queries("winsorized_mean")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    got shouldEqual expected
    // clipping is non-trivial on this data: the winsorized mean moves
    // off the raw mean for every group, and bounds are ordered
    got.foreach { g => assert(g._5 != g._6); assert(g._3 <= g._4) }
  }
}
