package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Pins the two transparent-state sketches that replaced Spark's opaque
  * HLL++/percentile_approx on the registered query surface (round-8
  * item #1): set semantics, determinism under repartitioning, and the
  * estimator's accuracy class. */
class KmvAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000007L

  test("KMV keeps the k smallest DISTINCT hashes, order-insensitively") {
    val kmv = udaf(new KmvAggregator(8), Encoders.scalaLong)
    // duplicates everywhere; values interleaved so partial buffers see
    // different subsets depending on the partitioning
    val hs = (1 to 500).map(i => ((i * 2654435761L) % M + M) % M)
    val dup = hs ++ hs ++ hs.take(100)
    val expect = hs.distinct.sorted.take(8)
    for (parts <- Seq(1, 3, 16)) {
      val got = dup.toDF("h").repartition(parts)
        .agg(kmv(col("h")).as("ks")).collect().head.getSeq[Long](0).toSeq
      got shouldEqual expect
    }
  }

  test("KMV below capacity returns ALL distinct hashes — the exact branch") {
    val kmv = udaf(new KmvAggregator(64), Encoders.scalaLong)
    val hs = Seq(5L, 3L, 3L, 9L, 5L, 1L)
    val got = hs.toDF("h").repartition(3)
      .agg(kmv(col("h")).as("ks")).collect().head.getSeq[Long](0).toSeq
    got shouldEqual Seq(1L, 3L, 5L, 9L)
  }

  test("KMV estimator lands within its error class on a known cardinality") {
    // 10k distinct md5-derived hashes, k=128 → std err ≈ 1/√126 ≈ 9%;
    // assert within 4σ so the test can't flake on an unlucky-but-legal
    // draw (the draw is deterministic anyway — md5 of fixed strings)
    val k = 128
    val kmv = udaf(new KmvAggregator(k), Encoders.scalaLong)
    val n = 10000
    val ks = (1 to n).map(_.toString).toDF("s")
      .select((conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long") % M).as("h"))
      .agg(kmv(col("h")).as("ks")).collect().head.getSeq[Long](0)
    ks.length shouldEqual k
    val est = (k - 1).toLong * M / ks.last
    math.abs(est.toDouble - n) / n should be < (4.0 / math.sqrt(k - 2.0))
  }

  test("bottom-k sample draws the k (pri, key)-smallest rows under any partitioning") {
    val samp = udaf(new BottomKSampleAggregator(5), Encoders.product[PriRow])
    val rows = (1 to 200).map(i =>
      (((i * 48271L) % 997L), i.toLong, i * 1.5)) // pri collisions via mod 997
    val expect = rows.sortBy(r => (r._1, r._2)).take(5)
      .map(r => PriRow(r._1, r._2, r._3))
    for (parts <- Seq(1, 4, 16)) {
      val got = rows.toDF("pri", "k", "v").repartition(parts)
        .agg(samp(col("pri"), col("k"), col("v")).as("s"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => PriRow(r.getLong(0), r.getLong(1), r.getDouble(2)))
      got shouldEqual expect
    }
  }

  test("bottom-k sample of a group smaller than k is the whole group") {
    val samp = udaf(new BottomKSampleAggregator(64), Encoders.product[PriRow])
    val got = Seq((9L, 1L, 0.5), (2L, 2L, 1.5)).toDF("pri", "k", "v")
      .agg(samp(col("pri"), col("k"), col("v")).as("s"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got shouldEqual Seq((2L, 2L, 1.5), (9L, 1L, 0.5))
  }
}
