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

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
    }

    // Two passes over the whole suite (not back-to-back per query, so a
    // contention burst is less likely to hit both passes of one query);
    // report the per-query minimum.
    val pass1 = names.map { case (name, fn) => (name, timeOnce(name, fn)) }
    val pass2 = names.map { case (name, fn) => (name, timeOnce(name, fn)) }
    val results = pass1.zip(pass2).map { case ((name, a), (_, b)) =>
      val v =
        if (a < 0 && b < 0) -1.0
        else if (a < 0) b
        else if (b < 0) a
        else math.min(a, b)
      (name, v)
    }
    pass1.zip(pass2).foreach { case ((name, a), (_, b)) =>
      System.err.println(f"[bench] $name%-28s pass1=$a%8.3f pass2=$b%8.3f")
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
    // Two stdout lines, per the round-6 verdict: the per-query dict grew to
    // ~3.5 KB at 150 queries and overflowed the driver's 2000-char tail
    // capture when embedded in the final line, hiding the total. So the
    // full per-query JSON goes on the PENULTIMATE line, and the LAST line
    // is total-only — bounded to a few hundred bytes at any suite size.
    println(s"""{"metric":"per_query","unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failedNames.size},"failed":$failed,"sf":"$sfDir"}""")
  }
}
