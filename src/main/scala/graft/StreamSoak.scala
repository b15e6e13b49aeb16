package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.sql.Timestamp

/** Streaming soak under the RocksDB state store (r10 verdict item #6):
  * every stateful operator was proven by micro-batch≡batch equivalence
  * on the default in-memory HDFS-backed store; this main closes the
  * remaining deployment axis — sustained state growth/eviction across
  * ≥ 100 micro-batches on `RocksDBStateStoreProvider`, the store a
  * production cluster actually runs.
  *
  * Three stateful pipelines soak concurrently, fed deterministic
  * advancing event-time batches (no wall-clock dependence; watermarks
  * advance with the data):
  *   - session_windows (session_window agg + watermark eviction)
  *   - dedup_within_horizon (dropDuplicatesWithinWatermark, 20%
  *     duplicate ids per batch probing the dedup state)
  *   - the ingest mirror (idempotentParquetSink foreachBatch)
  *
  * Assertions, checked EVERY batch from StreamingQueryProgress state
  * metrics: state row count stays bounded (≤ the analytic ceiling the
  * watermark implies — sessions/ids live 1h of event time, batches
  * advance 5 min, so ~12-13 batches of keys in flight, never the
  * whole history), and the run ends with > 100 committed batches per
  * query. Output: one JSON line (SOAK file via arg 0) with per-query
  * batch counts, max/final state rows, and max state memory.
  *
  * Usage: runMain graft.StreamSoak [outPath] [nBatches]
  */
object StreamSoak {
  case class SoakEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Option[Double], props: String)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SOAK_r11.json")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(120)
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("soak").toString
    def ck(n: String) = s"$tmp/ck-$n"

    val sessIn = MemoryStream[SoakEv]
    val dedupIn = MemoryStream[SoakEv]
    val ingestIn = MemoryStream[SoakEv]

    // three continuous queries, driven by processAllAvailable per round
    val sess = graft.streaming.EventStream.sessionWindows(sessIn.toDF())
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ck("sess")).start()
    val dedup = graft.streaming.EventStream.dedupWithinWatermark(dedupIn.toDF())
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ck("dedup")).start()
    val ingest = graft.streaming.EventStream
      .idempotentParquetSink(ingestIn.toDF(), s"$tmp/ingest-out", ck("ingest"))

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val stepMs = 5L * 60 * 1000 // event time advances 5 min per batch
    def batch(b: Int): Seq[SoakEv] =
      (0 until 200).map { i =>
        val isDup = i % 5 == 4 // 20% duplicate event ids probe dedup state
        val id = if (isDup) (b.toLong * 200 + i - 1) else b.toLong * 200 + i
        SoakEv(id, new Timestamp(t0 + b * stepMs + (i % 60) * 1000L),
          (i % 37).toLong, if (i % 3 == 0) "purchase" else "click",
          if (i % 11 == 0) None else Some((i % 50) / 4.0),
          s"""{"k": ${i % 100}}""")
      }

    case class Track(var batches: Long = 0, var maxRows: Long = 0,
        var finalRows: Long = 0, var maxMem: Long = 0, var violations: Long = 0)
    val tracks = Map("session" -> Track(), "dedup" -> Track(), "ingest" -> Track())
    // analytic ceiling: keys live 1h event time / 5-min steps = 13
    // batches in flight; sessions ≤ 37 users/batch-window and dedup
    // ≤ 200 ids per batch → ceilings with 2× slack
    val ceilings = Map("session" -> 2L * 13 * 37, "dedup" -> 2L * 13 * 200,
      "ingest" -> Long.MaxValue)

    def pump(q: StreamingQuery, name: String): Unit = {
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null) {
        val t = tracks(name)
        t.batches += 1
        val ops = p.stateOperators
        if (ops != null && ops.nonEmpty) {
          val rows = ops.map(_.numRowsTotal).sum
          val mem = ops.map(_.memoryUsedBytes).sum
          t.maxRows = math.max(t.maxRows, rows); t.finalRows = rows
          t.maxMem = math.max(t.maxMem, mem)
          if (rows > ceilings(name)) t.violations += 1
        }
      }
    }

    try {
      (0 until nBatches).foreach { b =>
        sessIn.addData(batch(b)); dedupIn.addData(batch(b)); ingestIn.addData(batch(b))
        pump(sess, "session"); pump(dedup, "dedup"); pump(ingest, "ingest")
      }
    } finally { sess.stop(); dedup.stop(); ingest.stop() }

    val provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    def j(n: String): String = {
      val t = tracks(n)
      s""""$n":{"batches":${t.batches},"max_state_rows":${t.maxRows},"final_state_rows":${t.finalRows},"max_state_mem_bytes":${t.maxMem},"ceiling_violations":${t.violations}}"""
    }
    val line =
      s"""{"metric":"stream_soak","provider":"${provider.split('.').last}","n_batches":$nBatches,${j("session")},${j("dedup")},${j("ingest")}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(line)
    val ok = tracks.values.forall(t => t.violations == 0 && t.batches >= 100)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
