package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  test("keeps the k best by (score desc, id asc), deterministically") {
    val agg = new TopKAggregator(3)
    val items = Seq(Scored(1.0, 5), Scored(9.0, 2), Scored(9.0, 1),
      Scored(3.0, 7), Scored(9.0, 9))
    val viaReduce = items.foldLeft(agg.zero)(agg.reduce)
    viaReduce shouldEqual Seq(Scored(9.0, 1), Scored(9.0, 2), Scored(9.0, 9))
    // merge in any split order gives the same result
    val (a, b) = items.splitAt(2)
    agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)) shouldEqual viaReduce
    agg.merge(b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce)) shouldEqual viaReduce
  }

  test("buffer never exceeds k (bounded state)") {
    val agg = new TopKAggregator(2)
    val buf = (1 to 100).map(i => Scored(i.toDouble, i.toLong))
      .foldLeft(agg.zero)(agg.reduce)
    buf.length shouldEqual 2
    buf.head.score shouldEqual 100.0
  }

  test("udaf agrees with the window top-k on a grouped frame") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L), ("a", 5.0, 4L),
      ("b", 2.0, 5L)).toDF("g", "score", "id")
    val topk = udaf(new TopKAggregator(2),
      org.apache.spark.sql.Encoders.product[Scored])
    val viaAgg = df.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("s"))
      .select(col("g"), col("s.score"), col("s.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    viaAgg shouldEqual Set(("a", 5.0, 2L), ("a", 5.0, 4L), ("b", 2.0, 5L))
  }
}
