package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankSpec extends SparkSpec {

  test("two-phase topKPerGroup equals the single-window top-k on skewed random data") {
    import spark.implicits._
    // deterministic pseudo-random scores, group sizes wildly skewed
    val df = (1 to 4000).map { i =>
      (s"g${i % 7}", i.toLong, (i * 2654435761L % 1000003L).toDouble)
    }.toDF("g", "id", "score").repartition(13) // many slices per group
    val got = Rank.topKPerGroup(df, 5, Seq("g"), Seq(col("score").desc, col("id")))
      .select("g", "id", "score", "rk").orderBy("g", "rk")
      .collect().map(_.toSeq).toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("g", "id", "score", "rk").orderBy("g", "rk")
      .collect().map(_.toSeq).toSeq
    got shouldEqual want
  }

  test("k larger than every group degenerates to a full ranking") {
    import spark.implicits._
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 1.0), ("b", 3L, 2.0)).toDF("g", "id", "score")
      .repartition(4)
    val r = Rank.topKPerGroup(df, 10, Seq("g"), Seq(col("score").desc, col("id")))
      .orderBy("g", "rk").collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    r.toSeq shouldEqual Seq(("a", 1L, 1), ("a", 2L, 2), ("b", 3L, 1))
  }
}
