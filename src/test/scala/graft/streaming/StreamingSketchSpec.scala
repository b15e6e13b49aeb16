package graft.streaming

import graft.SparkSpec
import graft.functions.{BottomKSampleAggregator, KmvAggregator, PriRow}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** OPERATIONS.md claims the transparent sketches (KMV distinct,
  * bottom-k priority sample) are "mergeable across batches: incremental
  * maintenance is a merge, not a recompute". This spec proves it
  * through real micro-batch execution: the sketch maintained
  * incrementally by Structured Streaming's state store across several
  * batches must equal the sketch computed in one batch over the union
  * of all the data — the merge-associativity contract, exercised end
  * to end rather than asserted from the Aggregator laws. Complete
  * output mode keeps the memory sink at exactly the current per-key
  * state, so the comparison reads one row per key. */
class StreamingSketchSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def hash(i: Long): Long = (i * 2654435761L) % 1000000007L

  test("KMV sketch maintained across micro-batches equals the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kmv = udaf(new KmvAggregator(8), Encoders.scalaLong)
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("lang", "h")
      .groupBy("lang").agg(kmv(col("h")).as("ks"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("kmv_s").option("checkpointLocation", tmp("kmv")).start()
    // three batches with overlapping duplicates across batch boundaries,
    // so both the in-buffer dedup and the state-store merge paths run
    val b1 = (1L to 40L).map(i => ("en", hash(i)))
    val b2 = (20L to 70L).map(i => ("en", hash(i))) ++ Seq(("de", hash(5L)))
    val b3 = (60L to 90L).map(i => ("en", hash(i))) ++ Seq(("de", hash(6L)))
    try {
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("kmv_s").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      val batch = (b1 ++ b2 ++ b3).toDF("lang", "h")
        .groupBy("lang").agg(kmv(col("h")).as("ks")).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      streamed shouldEqual batch
      // the 'en' sketch is genuinely at capacity (the truncating merge
      // ran, not just whole-set accumulation)
      streamed("en").size shouldEqual 8
      streamed("de").size shouldEqual 2
    } finally q.stop()
  }

  test("bottom-k sample maintained across micro-batches equals the batch sample") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val samp = udaf(new BottomKSampleAggregator(5), Encoders.product[PriRow])
    val in = MemoryStream[(String, Long, Long, Double)]
    val q = in.toDF().toDF("g", "pri", "k", "v")
      .groupBy("g").agg(samp(col("pri"), col("k"), col("v")).as("s"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("samp_s").option("checkpointLocation", tmp("samp")).start()
    val rows = (1L to 60L).map(i => ("g1", hash(i) % 997L, i, i * 1.5))
    val (b1, rest) = rows.splitAt(20)
    val (b2, b3) = rest.splitAt(20)
    try {
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("samp_s").collect()
        .map { r =>
          r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
        }.toMap
      val expect = rows.sortBy(r => (r._2, r._3)).take(5)
        .map(r => (r._2, r._3, r._4))
      streamed("g1") shouldEqual expect
    } finally q.stop()
  }
}
