package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the physical-layout behaviors the 100 TB posture depends on:
  * partition pruning on partitioned parquet and shuffle-free joins on
  * co-bucketed tables. These are plan-level assertions — if a Spark
  * upgrade or conf change silently stops pruning or re-introduces an
  * exchange, this spec fails. */
class PartitioningSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("partitioned parquet write → read prunes partitions at the scan") {
    val out = tmp("part-events") + "/events"
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val one = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val plan = one.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("event_type")
    // pruned scan reads strictly fewer rows than the full table
    val full = spark.read.parquet(out).count()
    val pruned = one.count()
    pruned should be < full
    pruned shouldEqual Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase").count()
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    o.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(spark, "/root/testdata/sf0.001")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    try {
      val joined = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      // disable broadcast so the join would normally shuffle both sides
      val plan = withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        joined.queryExecution.executedPlan.toString
      }
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldEqual
        o.join(Tables.customer(spark, "/root/testdata/sf0.001"),
          col("o_custkey") === col("c_custkey")).count()
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

}
