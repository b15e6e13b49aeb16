package graft

import org.apache.spark.sql.functions._

/** EVERY registered query must survive a degenerate, FK-consistent
  * 1-row-ish corpus without throwing — the crash class the empty-corpus
  * gate (EdgeCasesSpec) cannot reach: Spark 4 runs ANSI mode, where a
  * divide-by-zero, bad cast, or array index that only degenerate data
  * triggers KILLS the job instead of yielding null. A production
  * engine's operators meet single-row partitions constantly (a fresh
  * tenant, a partition-pruned slice, the first micro-batch), so
  * "no-throw on degenerate input" is a contract, not a nicety.
  *
  * The slice keeps referential integrity so star joins exercise their
  * real paths: the full (tiny) region/nation dims, ONE customer with
  * their orders and those orders' lineitems, one supplier, one part,
  * one document, one embedding, five events. Queries that inner-join
  * to an absent key simply produce fewer rows — never an error. */
class DegenerateCorpusSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("edge-one").toString
    def w(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$d/$name.parquet")
    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")
    w("region", t("region"))
    w("nation", t("nation"))
    val cust = t("customer").orderBy("c_custkey").limit(1)
    w("customer", cust)
    w("supplier", t("supplier").orderBy("s_suppkey").limit(1))
    w("part", t("part").orderBy("p_partkey").limit(1))
    val ckey = cust.select("c_custkey").first().getLong(0)
    val orders = t("orders").filter(col("o_custkey") === ckey)
    w("orders", orders)
    w("lineitem", t("lineitem").join(
      orders.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey")))
    w("events", t("events").orderBy("event_id").limit(5))
    w("documents", t("documents").orderBy("doc_id").limit(1))
    w("embeddings", t("embeddings").orderBy("vec_id").limit(1))
    d
  }

  test("all registered queries run on a 1-row-ish FK-consistent corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
