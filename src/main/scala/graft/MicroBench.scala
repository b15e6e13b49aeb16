package graft

import org.apache.spark.sql.functions._

/** Dev tool: isolate the per-element cost of the native fixed-point
  * expressions against their higher-order-function reference forms on
  * a synthetic in-memory corpus big enough that per-row work dominates
  * scheduling (the regime a 100 TB scan is always in — the registered
  * bench's 5k-vector embeddings table can't resolve these constants
  * above run-to-run noise).
  *
  * Usage: runMain graft.MicroBench [nRows] (default 2,000,000 × 64 dims)
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic embeddings: 64 floats derived from the id
    val vecs = spark.range(n).select(
      expr("transform(sequence(0, 63), i -> CAST(sin(id * (i + 1)) AS FLOAT))")
        .as("embedding"))
      .localCheckpoint(true) // materialize so generation is off the clock

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$label%-28s $s%8.3f s")
      s
    }

    val hofQ = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT))")
    val natQ = graft.functions.QuantizeFx.quantize_fx(col("embedding"), 1e7)
    val hofDot = (q: org.apache.spark.sql.Column) =>
      expr("aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (a, x) -> a + x)")
    def run2(label: String, f: => org.apache.spark.sql.DataFrame): Double =
      math.min(time(label)(f), time(label)(f)) // min-of-2, same as Bench

    val tHof = run2("HOF quantize + HOF dot",
      vecs.select(hofQ.as("q")).select(hofDot(col("q")).as("d")))
    val tMix = run2("HOF quantize + native dot",
      vecs.select(hofQ.as("q"))
        .select(graft.functions.DotProductFx.dot_fx(col("q"), col("q")).as("d")))
    val tNat = run2("native quantize + native dot",
      vecs.select(natQ.as("q"))
        .select(graft.functions.DotProductFx.dot_fx(col("q"), col("q")).as("d")))
    // the envelope-enforcing form the similarity family actually runs
    // (Similarity.MaxAbs = 16): prices the r12 branchless max-accumulate
    // check against the unchecked loop at a scale where the constant
    // resolves above noise (the registered 5k-vector bench cannot)
    val envQ = graft.functions.QuantizeFx.quantize_fx(col("embedding"), 1e7, 16.0)
    val tEnv = run2("native quantize+envelope + dot",
      vecs.select(envQ.as("q"))
        .select(graft.functions.DotProductFx.dot_fx(col("q"), col("q")).as("d")))
    System.err.println(f"native/HOF = ${tNat / tHof}%.3f  envelope/native = ${tEnv / tNat}%.3f")
    println(s"""{"rows":$n,"hof_sec":$tHof,"mixed_sec":$tMix,"native_sec":$tNat,"envelope_sec":$tEnv}""")
    spark.stop()
  }
}
