package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Rank}

/** Degenerate-input behavior of the iterative/heavy operators: empty
  * and trivially small frames must flow through, not throw — at 100 TB
  * a partition-pruned or filtered-to-nothing input is an everyday
  * occurrence, not an error. */
class EdgeCasesSpec extends SparkSpec {

  test("jaccardPairs on an empty corpus and on shingle-less docs is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.jaccardPairs(empty, 0.5).count() shouldEqual 0
    // two-token docs produce no 3-shingles → no pairs (not a crash)
    val short = Seq(1L -> "a b", 2L -> "a b").toDF("doc_id", "text")
    Dedup.jaccardPairs(short, 0.5).count() shouldEqual 0
  }

  test("connectedComponents on an empty pair frame converges to empty labels") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("d1", "d2")
    Dedup.connectedComponents(none).count() shouldEqual 0
  }

  test("topKPerGroup on an empty frame is empty and keeps the rk column") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Double)].toDF("g", "id", "score")
    val r = Rank.topKPerGroup(empty, 3, Seq("g"), Seq(col("score").desc, col("id")))
    r.columns should contain("rk")
    r.count() shouldEqual 0
  }

  test("minhash signatures of an empty shingle stream are an empty frame") {
    import spark.implicits._
    val e = Seq.empty[(Long, String)].toDF("doc_id", "s")
    Dedup.minhashSigAgg(e).count() shouldEqual 0
  }
}
