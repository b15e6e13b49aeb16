package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the SF dir in
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line on stdout.
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
  * Verify writes actual parquet through the same plans. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val note = "timing action is a noop-format write (full materialization incl. " +
      "final sort/projection) after a per-query warmup pass at sf0.001 (codegen/JIT " +
      "compiled off the clock; timings measure steady-state data processing); " +
      "rounds <= 3 timed first-run count(), which let Catalyst prune final sorts " +
      "— totals are not comparable across that change"
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"action":"noop-write-warmed","note":"$note","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
