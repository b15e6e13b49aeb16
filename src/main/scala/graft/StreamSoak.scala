package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import java.sql.Timestamp

/** Streaming soak under the RocksDB state store (r10 verdict item #6,
  * crash-recovery extension r12 item #7): every stateful operator was
  * proven by micro-batch≡batch equivalence on the default in-memory
  * HDFS-backed store; this main closes the remaining deployment axes —
  * sustained state growth/eviction across ≥ 100 micro-batches on
  * `RocksDBStateStoreProvider`, AND recovery from a mid-run kill: at
  * batch `restartAt` (default 60) every query is stopped WITHOUT
  * draining (its freshest batch still in flight — the crash shape) and
  * restarted from its RocksDB checkpoint, then the run continues and
  * the final outputs are checked against one-shot batch results.
  *
  * Three stateful pipelines soak concurrently, fed deterministic
  * advancing event-time batches (no wall-clock dependence; watermarks
  * advance with the data):
  *   - session_windows (session_window agg + watermark eviction)
  *   - dedup_within_horizon (dropDuplicatesWithinWatermark, 20%
  *     duplicate ids per batch probing the dedup state) — routed
  *     through the exactly-once FILE sink so its post-recovery output
  *     can be diffed against batch dropDuplicates
  *   - the ingest mirror (idempotentParquetSink foreachBatch)
  *
  * Assertions, checked EVERY batch from StreamingQueryProgress state
  * metrics: state row count stays bounded (≤ the analytic ceiling the
  * watermark implies — sessions/ids live 1h of event time, batches
  * advance 5 min, so ~12-13 batches of keys in flight, never the
  * whole history), the run ends with > 100 committed batches per
  * query ACROSS the restart, and both retained sinks merge to their
  * one-shot batch equivalents with 0 row divergences (the idempotency
  * claim under real recovery, not just replay). Output: one JSON line
  * (SOAK file via arg 0) with per-query batch counts, max/final state
  * rows, max state memory, restart counts, and divergence counts.
  *
  * Usage: runMain graft.StreamSoak [outPath] [nBatches] [restartAt]
  */
object StreamSoak {
  case class SoakEv(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Option[Double], props: String)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SOAK_r12.json")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(120)
    val restartAt = args.drop(2).headOption.map(_.toInt).getOrElse(60)
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

    // restartable starters: recovery reuses the SAME checkpoint dir (the
    // RocksDB state + offset/commit logs) and the SAME MemoryStream, so
    // a restarted query resumes from the last committed epoch and
    // replays whatever was in flight when it was killed
    def startSess(): StreamingQuery =
      graft.streaming.EventStream.sessionWindows(sessIn.toDF())
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$tmp/sess-out")
        .option("checkpointLocation", ck("sess")).start()
    // FILE sink (exactly-once via the sink's commit log) so the final
    // content survives the restart for the divergence diff below
    def startDedup(): StreamingQuery =
      graft.streaming.EventStream.dedupWithinWatermark(dedupIn.toDF())
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$tmp/dedup-out")
        .option("checkpointLocation", ck("dedup")).start()
    def startIngest(): StreamingQuery = graft.streaming.EventStream
      .idempotentParquetSink(ingestIn.toDF(), s"$tmp/ingest-out", ck("ingest"))

    var sess = startSess()
    var dedup = startDedup()
    var ingest = startIngest()

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
        var finalRows: Long = 0, var maxMem: Long = 0, var violations: Long = 0,
        var restarts: Long = 0)
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
        if (b == restartAt) {
          // crash simulation: stop with batch b STILL IN FLIGHT (no
          // drain), then restart from the RocksDB checkpoints — the
          // engine must replay the uncommitted epoch under its original
          // batch id and the sinks' idempotence must absorb it
          sess.stop(); dedup.stop(); ingest.stop()
          sess = startSess(); dedup = startDedup(); ingest = startIngest()
          tracks.values.foreach(_.restarts += 1)
        }
        pump(sess, "session"); pump(dedup, "dedup"); pump(ingest, "ingest")
      }
      // watermark flush: every real session keeps EXTENDING (users recur
      // every 5-min batch, gap is 30 min), so append mode emits nothing
      // until the watermark passes their ends. Two far-future batches on
      // a sentinel user close them all (the second advances the
      // watermark computed after the first); the sentinel's own sessions
      // stay un-emitted (the watermark never passes them), so the
      // retained output is exactly the real sessions.
      Seq(100, 101).foreach { k =>
        val fts = new Timestamp(t0 + (nBatches.toLong + k) * stepMs * 12)
        sessIn.addData(Seq(SoakEv(-k.toLong, fts, 999L, "flush", None, "{}")))
        pump(sess, "session")
      }
    } finally { sess.stop(); dedup.stop(); ingest.stop() }

    // ── post-recovery divergence checks vs one-shot batch results ──
    val allRows = (0 until nBatches).flatMap(batch)
    // multiset symmetric difference via per-row-value counts and a
    // NULL-SAFE full-outer join (value is nullable) — not exceptAll,
    // which binds stale attribute ids when one side's lineage contains
    // a dropDuplicates over the other (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    def symmetricDiff(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Long = {
      val cols = b.columns.toSeq
      val ag = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__ca"))
      val bg = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cb"))
      val cond = cols.map(c => ag(c) <=> bg(c)).reduce(_ && _)
      ag.join(bg, cond, "full_outer")
        .select(abs(coalesce(col("__ca"), lit(0L)) -
          coalesce(col("__cb"), lit(0L))).as("d"))
        .agg(coalesce(sum(col("d")), lit(0L))).collect()(0).getLong(0)
    }
    // ingest: union of every input batch, exactly (redelivered epochs
    // overwrite their own batch_id partition)
    val ingestGot = spark.read.parquet(s"$tmp/ingest-out").drop("batch_id")
    val expected = spark.createDataset(allRows).toDF()
    val ingestDiv = symmetricDiff(ingestGot.select(expected.columns.map(col): _*), expected)
    // dedup: planted duplicates are WITHIN-batch only and ids are unique
    // across batches, so the watermark-horizon dedup must equal global
    // batch dropDuplicates on event_id (keep-first over identical rows)
    val dedupGot = spark.read.parquet(s"$tmp/dedup-out")
    val dedupExpected = expected.dropDuplicates("event_id")
    val dedupDiv = symmetricDiff(dedupGot.select(dedupExpected.columns.map(col): _*), dedupExpected)
    // session: after the watermark flush the retained output must equal
    // the ONE-SHOT batch sessionization of the real rows (same function,
    // batch mode — micro-batch≡batch across a crash-restart)
    val sessGot = spark.read.parquet(s"$tmp/sess-out")
    val sessExpected = graft.streaming.EventStream.sessionWindows(expected)
    val sessDiv = symmetricDiff(sessGot.select(sessExpected.columns.map(col): _*), sessExpected)

    val provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    val divs = Map("session" -> sessDiv, "dedup" -> dedupDiv, "ingest" -> ingestDiv)
    def j(n: String): String = {
      val t = tracks(n)
      s""""$n":{"batches":${t.batches},"max_state_rows":${t.maxRows},"final_state_rows":${t.finalRows},"max_state_mem_bytes":${t.maxMem},"ceiling_violations":${t.violations},"restarts":${t.restarts},"divergences":${divs(n)}}"""
    }
    val line =
      s"""{"metric":"stream_soak","provider":"${provider.split('.').last}","n_batches":$nBatches,"restart_at":$restartAt,${j("session")},${j("dedup")},${j("ingest")}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(line)
    val ok = tracks.values.forall(t => t.violations == 0 && t.batches >= 100) &&
      ingestDiv == 0 && dedupDiv == 0 && sessDiv == 0
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
