package graft

/** Pins the r13 retention contract of the Tables relation memo (the
  * r12 advice close): the outer map is a BOUNDED access-ordered LRU,
  * so a session that memoized tables is retained at most until
  * MaxSessions(8) newer sessions touch the memo — the property the
  * r12 WeakHashMap attempt could not deliver (memoized DataFrames
  * strongly reference their session, so weak keys never cleared).
  * Eviction must be harmless: a live session evicted under churn just
  * re-resolves on its next access. */
class TablesRetentionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the memo never holds more than 8 sessions; the eldest is evicted, not pinned") {
    val first = spark.newSession()
    Tables.table(first, sf, "region").count() shouldEqual
      Tables.table(spark, sf, "region").count()
    assert(Tables.memoHas(first))
    // ten newer sessions churn the memo past the bound
    val newer = (1 to 10).map { _ =>
      val s = spark.newSession()
      Tables.table(s, sf, "nation").schema.fieldNames.length should be > 0
      s
    }
    Tables.memoSessionCount should be <= 8
    // the eldest (first) session's entry is GONE — the leak class the
    // r12 advice named is bounded now
    assert(!Tables.memoHas(first))
    // the most recent sessions are still memoized
    assert(Tables.memoHas(newer.last))
    // eviction is harmless: the evicted session re-memoizes on access
    Tables.table(first, sf, "region").count() should be > 0L
    assert(Tables.memoHas(first))
  }

  test("release() drops a session's entry deterministically and re-access rebuilds") {
    val s = spark.newSession()
    Tables.table(s, sf, "customer").schema.fieldNames should contain("c_custkey")
    assert(Tables.memoHas(s))
    Tables.release(s)
    assert(!Tables.memoHas(s))
    // rebuild on demand, same relation
    Tables.table(s, sf, "customer").count() should be > 0L
    assert(Tables.memoHas(s))
  }
}
