package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the SF dir in
  * SPARK_GRAFT_SF_DIR and prints TWO JSON lines: the full per-query dict
  * on the penultimate stdout line, and a total-only JSON (bounded to a
  * few hundred bytes at any suite size) as the very LAST line. All
  * methodology commentary goes to stderr. History: round 4's ~4 KB line
  * with an embedded note and round 6's 150-entry per-query dict each
  * overflowed the driver's 2000-char tail capture → "parsed": null;
  * splitting the lines makes the total un-overflowable.
  *
  * A short warmup (session init + one tiny action per input table)
  * runs before timing so the first measured query doesn't absorb JVM /
  * codegen / Hadoop-client startup, which at sf0.1 otherwise dominates
  * whichever query happens to run first. Failed queries report value
  * -1.0 and are listed in "failed" — never silently timed.
  *
  * Timing action: a `noop`-format write, which materializes EVERY
  * output row through the full physical plan. `count()` would let
  * Catalyst prune the final sort/projection (count needs neither), and
  * the sink ordering every query carries is real work worth timing —
  * Verify writes actual parquet through the same plans.
  *
  * Contention hardening: each query is timed twice and the MINIMUM is
  * reported. A single pass is exposed to whatever else the machine is
  * doing (round 4's driver run was distorted 5-20x on some queries by
  * machine contention); min-of-2 recovers the idle-machine number as
  * long as at least one pass runs clean.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default matches the documented bench posture (local[32]); the
    // driver may still override via SPARK_GRAFT_CPUS.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: initialize parquet reader, shuffle machinery, and codegen
    // paths once, off the clock.
    Seq("lineitem", "documents", "events", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    // Per-query steady-state warmup at the smallest SF: the same plan
    // shapes compile their generated code once off the clock, so the
    // timed run at the target SF measures data processing — the part
    // that scales with input — instead of first-run Janino/JIT work,
    // which at 100 TB is amortized to nothing but at bench scale was
    // both a large constant and the dominant run-to-run variance.
    // SPARK_GRAFT_BENCH_ONLY (csv of query names) restricts the bench
    // to a subset — an isolation/profiling aid; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val warmDir = "/root/testdata/sf0.001"
    names.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // Per-query shuffle accounting (r13, the r12 verdict's tripwire
    // item): total shuffle read/write bytes from a task-metrics
    // listener, snapshotted around each timed run, reported from the
    // SAME pass the min wall time comes from. Purpose: a code change
    // that silently doubles a query's shuffle at sf0.1 while its wall
    // time hides in machine noise now shows in the artifact, and
    // scripts/bench_trend.py gates on it like it gates wall time.
    // No settle sleeps between queries (ScaleBench pays 1 s per
    // measurement; 195×2 of those would add ~7 min to every bench):
    // listener postings are asynchronous, so a query's last in-flight
    // tasks can bleed a few MB into the NEXT query's delta — the trend
    // gate's ratio+absolute-floor thresholds absorb that, and the
    // bleed is consistent across rounds (same suite order).
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })

    // Plan-vs-execute split (round-9 item #4): job wall-clock intervals
    // from the scheduler listener; per timed run, exec = union length of
    // the job intervals inside the run's window, plan = wall − exec
    // (driver-side analysis/optimization, codegen, AND the sanctioned
    // eager-construction gates, which run scans through their OWN jobs —
    // those jobs count as exec, so "plan" here is pure driver think
    // time). Enabled only when SPARK_GRAFT_PLAN_SPLIT names an output
    // path (the driver never sets it — its two stdout lines are
    // unchanged).
    val splitPath = sys.env.get("SPARK_GRAFT_PLAN_SPLIT")
    val jobSpans = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    if (splitPath.isDefined)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val open = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
          override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            open.put(e.jobId, e.time)
          override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = open.remove(e.jobId)
            if (s != null) jobSpans.add((s.longValue, e.time))
          }
        })

    // (sec, windowStartMs, windowEndMs, shuffleReadMb, shuffleWriteMb)
    // — the window bounds feed the plan/execute attribution when the
    // split is enabled
    case class Run(sec: Double, w0: Long, w1: Long, rdMb: Double, wrMb: Double)
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Run = {
      val r0 = shufRead.get; val s0 = shufWrite.get
      val w0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Run((System.nanoTime() - t0) / 1e9, w0, System.currentTimeMillis(),
          (shufRead.get - r0) / 1e6, (shufWrite.get - s0) / 1e6)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        Run(-1.0, w0, System.currentTimeMillis(), 0.0, 0.0)
      }
    }

    // Two passes over the whole suite (not back-to-back per query, so a
    // contention burst is less likely to hit both passes of one query);
    // report the per-query minimum.
    val pass1 = names.map { case (name, fn) => (name, timeOnce(name, fn)) }
    val pass2 = names.map { case (name, fn) => (name, timeOnce(name, fn)) }
    val results = pass1.zip(pass2).map { case ((name, a), (_, b)) =>
      val v =
        if (a.sec < 0 && b.sec < 0) -1.0
        else if (a.sec < 0) b.sec
        else if (b.sec < 0) a.sec
        else math.min(a.sec, b.sec)
      (name, v)
    }
    // shuffle bytes from the pass the reported (min) wall time comes
    // from — the ScaleBench convention (deterministic per pass up to
    // AQE decisions + the bleed noted above)
    val shuffles = pass1.zip(pass2).map { case ((name, a), (_, b)) =>
      val best =
        if (b.sec < 0 || (a.sec >= 0 && a.sec <= b.sec)) a else b
      (name, best.rdMb, best.wrMb)
    }
    pass1.zip(pass2).foreach { case ((name, a), (_, b)) =>
      System.err.println(
        f"[bench] $name%-28s pass1=${a.sec}%8.3f pass2=${b.sec}%8.3f shuffleW=${math.min(a.wrMb, b.wrMb)}%9.1fMB")
    }

    // Attribute exec/plan per query from the MIN pass's window: merged
    // union of job intervals clipped to the window (AQE overlaps jobs,
    // so a plain sum would double-count).
    splitPath.foreach { path =>
      Thread.sleep(1500) // let the listener bus drain the last postings
      val spans = {
        val it = jobSpans.iterator(); val b = Seq.newBuilder[(Long, Long)]
        while (it.hasNext) b += it.next(); b.result().sortBy(_._1)
      }
      def execMs(w0: Long, w1: Long): Long = {
        val clipped = spans
          .map { case (s, e) => (math.max(s, w0), math.min(e, w1)) }
          .filter { case (s, e) => e > s }
        var total = 0L; var curS = Long.MinValue; var curE = Long.MinValue
        clipped.foreach { case (s, e) =>
          if (s > curE) { total += math.max(0L, curE - curS); curS = s; curE = e }
          else curE = math.max(curE, e)
        }
        total + math.max(0L, curE - curS)
      }
      def fmt3(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val lines = pass1.zip(pass2).collect {
        case ((name, a), (_, b)) if a.sec >= 0 || b.sec >= 0 =>
          val best =
            if (b.sec < 0 || (a.sec >= 0 && a.sec <= b.sec)) a else b
          val ex = execMs(best.w0, best.w1) / 1e3
          name -> (best.sec, math.min(ex, best.sec),
            best.sec - math.min(ex, best.sec))
      }
      val body = lines.map { case (n, (w, e, p)) =>
        s""""$n":{"wall":${fmt3(w)},"exec":${fmt3(e)},"plan":${fmt3(p)}}"""
      }.mkString("{", ",", "}")
      val (tw, te, tp) = lines.foldLeft((0.0, 0.0, 0.0)) {
        case ((w, e, p), (_, (w1, e1, p1))) => (w + w1, e + e1, p + p1)
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"""{"total":{"wall":${fmt3(tw)},"exec":${fmt3(te)},"plan":${fmt3(tp)}},"queries":$body}\n""")
      System.err.println(f"[bench] plan-split: wall=$tw%.1f exec=$te%.1f plan=$tp%.1f -> $path")
    }
    System.err.println(
      "[bench] methodology: noop-format write (full materialization incl. final " +
      "sort/projection) after a per-query warmup pass at sf0.001; each query timed " +
      "twice across two suite passes, minimum reported (contention hardening)")

    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma decimal separator would corrupt the machine-parsed JSON line.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // The failed list is capped at 8 names so the final line stays a few
    // hundred bytes even in a catastrophic all-fail run; n_failed carries
    // the true count and the per-query line has every value.
    val failedNames = results.collect { case (k, v) if v < 0 => k }
    val failed = failedNames.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    spark.stop()
    // THREE stdout lines (shuffle line added r13), ordered so the two
    // lines the driver parses stay LAST, per the round-6 verdict: the
    // per-query dict grew to ~3.5 KB at 150 queries and overflowed the
    // driver's 2000-char tail capture when embedded in the final line,
    // hiding the total. Shuffle first (informational, consumed by the
    // committed builder artifact + bench_trend), then the full
    // per-query JSON on the PENULTIMATE line, and the LAST line is
    // total-only — bounded to a few hundred bytes at any suite size.
    def fmt1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val sh = shuffles.map { case (k, r, w) =>
      "\"" + k + "\":{\"r\":" + fmt1(r) + ",\"w\":" + fmt1(w) + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"per_query_shuffle","unit":"mb","queries":$sh,"sf":"$sfDir"}""")
    println(s"""{"metric":"per_query","unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failedNames.size},"failed":$failed,"sf":"$sfDir"}""")
  }
}
