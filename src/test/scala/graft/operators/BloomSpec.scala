package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildFor(keys: Seq[Long]) =
    Bloom.build(keys.toDF("k"), "k")

  test("no false negatives: every inserted key passes the membership test") {
    val keys = (1L to 200L).map(_ * 7)
    val bloom = buildFor(keys)
    val hits = keys.toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom"), col("k")))
      .count()
    hits shouldBe keys.size.toLong
  }

  test("non-members are mostly rejected (FP rate well under theory-adjacent bound)") {
    val keys = (1L to 200L).map(_ * 7)
    val bloom = buildFor(keys)
    // disjoint probe domain (offset beyond the key domain)
    val probes = (1L to 2000L).map(_ + 1000000L)
    val fps = probes.toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom"), col("k")))
      .count()
    // fill = 1 - e^(-2*200/4096) ≈ 0.093 → FP ≈ 0.9%; assert a loose 5%
    fps.toDouble / probes.size should be < 0.05
  }

  test("the built filter is one row with at most M/32 words") {
    val rows = buildFor((1L to 500L).toSeq).collect()
    rows.length shouldBe 1
    val m = rows.head.getMap[Long, Long](0)
    m.size should be <= (Bloom.Bits / 32).toInt
    // every word is a positive 32-bit pattern (sign bit never touched)
    m.values.foreach { w => w should be > 0L; w should be < (1L << 32) }
  }

  test("an empty build yields an empty map that rejects everything") {
    val bloom = Bloom.build(Seq.empty[Long].toDF("k"), "k")
    val hits = (1L to 50L).toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom"), col("k")))
      .count()
    hits shouldBe 0L
  }

  test("null build keys are dropped, not a NULL_MAP_KEY crash") {
    val keys = Seq[java.lang.Long](1L, null, 2L).toDF("k")
    val bloom = Bloom.build(keys, "k")
    val hits = Seq(1L, 2L, 3L).toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom"), col("k")))
      .collect().map(_.getLong(0)).toSet
    hits should contain allOf (1L, 2L) // no false negatives on real keys
  }
}
