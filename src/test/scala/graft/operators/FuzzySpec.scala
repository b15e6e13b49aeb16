package graft.operators

import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("pairs within distance 1 on a bounded domain, (s1 < s2) shape") {
    val df = Seq("acme", "acme", "acme1", "acmi", "zebra")
      .toDF("source")
    val out = Fuzzy.pairsWithinDistance(df, "source").orderBy("s1", "s2").collect()
    out.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq shouldEqual Seq(
      ("acme", "acme1", 1), ("acme", "acmi", 1))
  }

  test("the quadratic path fails fast past the configured domain bound") {
    val big = (0 until 50).map(i => s"src$i").toDF("source")
    withSQLConf(Fuzzy.MaxDomainKey -> "49") {
      val e = the[IllegalArgumentException] thrownBy
        Fuzzy.pairsWithinDistance(big, "source")
      e.getMessage should include("quadratic")
      e.getMessage should include("ngram_jaccard")
    }
    // at exactly the bound it runs (49 < 50 is the failing case above)
    withSQLConf(Fuzzy.MaxDomainKey -> "50") {
      noException should be thrownBy Fuzzy.pairsWithinDistance(big, "source")
    }
  }

  test("the guard counts the DISTINCT domain, not raw rows") {
    // 1000 rows but only 3 distinct values: must pass a tight bound
    val dup = (0 until 1000).map(i => s"src${i % 3}").toDF("source")
    withSQLConf(Fuzzy.MaxDomainKey -> "3") {
      Fuzzy.pairsWithinDistance(dup, "source").count() shouldEqual 3L // src0/1/2 all within 1
    }
  }
}
