package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the training-pipeline queries (X-38..X-41)
  * over the sf0.001 corpus — the oracle pins exact values; these pin
  * the semantics a reader should be able to rely on. */
class TrainingOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sequence_pack: offsets stay inside the chunk and ids advance with the stream") {
    val r = q("sequence_pack")
    r.filter(col("seq_offset") < 0 || col("seq_offset") >= 2048).count() shouldEqual 0
    r.filter(col("seq_id") < 0).count() shouldEqual 0
    // within a packing stratum, chunk ids never decrease as doc_id advances
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "shard").orderBy("doc_id")
    r.withColumn("prev", lag(col("seq_id"), 1).over(w))
      .filter(col("prev").isNotNull && col("seq_id") < col("prev"))
      .count() shouldEqual 0
  }

  test("decontaminate: never flags a benchmark doc, and hits are positive") {
    val r = q("decontaminate")
    r.filter(col("doc_id") % 10 === 0).count() shouldEqual 0
    r.filter(col("n_hits") <= 0).count() shouldEqual 0
  }

  test("repetition_stats: fractions in [0,1] and the flag matches its definition") {
    val r = q("repetition_stats")
    r.filter(col("top_token_frac") < 0 || col("top_token_frac") > 1).count() shouldEqual 0
    r.filter(col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1).count() shouldEqual 0
    r.filter(col("flagged") =!=
      (col("top_token_frac") > 0.2 || col("dup_bigram_frac") > 0.5)).count() shouldEqual 0
  }

  test("pii_scrub: scrubbed hash differs from the raw hash exactly when emails were found") {
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("raw_hash"))
    val r = q("pii_scrub").join(raw, "doc_id")
    r.filter(col("n_emails") > 0 && col("scrubbed_hash") === col("raw_hash"))
      .count() shouldEqual 0
    r.filter(col("n_emails") === 0 && col("scrubbed_hash") =!= col("raw_hash"))
      .count() shouldEqual 0
    // (no planted emails in the tiny sf0.001 slice — the equivalence
    // above is the invariant; sf0.01's oracle run covers the hit path)
  }
}
