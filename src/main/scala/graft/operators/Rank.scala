package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact per-group top-k (T-2 at corpus scale).
  *
  * A single `row_number` window per group is exact but sorts the ENTIRE
  * group in one task — fine when groups are numerous and small (links
  * per company), a funnel when they are few and huge (k neighbors per
  * query over a 100 TB corpus: each query's partition holds the whole
  * scored scan). The classic fix is two-phase:
  *
  *  1. pre-prune with the same ranking keyed by (group, PHYSICAL input
  *     partition): every task ranks only its local slice of the group,
  *     so partition sizes stay bounded by the scan split size and all
  *     cores participate;
  *  2. run the real window over the ≤ k × numPartitions survivors —
  *     a frame small enough that the per-group sort is trivial.
  *
  * Exactness: the global top-k of a group is a subset of the union of
  * its per-slice top-ks (any row beaten by ≥ k rows in its own slice is
  * beaten by ≥ k rows globally). The pre-prune partitioning is physical
  * and may vary run to run, but the FINAL ranking re-orders survivors
  * with the caller's full ordering, so results are deterministic as
  * long as that ordering is total (callers tiebreak on a key). */
object Rank {

  def topKPerGroup(df: DataFrame, k: Int, group: Seq[String],
      order: Seq[Column], rkName: String = "rk"): DataFrame = {
    val gcols = group.map(col)
    val pre = Window.partitionBy(gcols :+ spark_partition_id(): _*).orderBy(order: _*)
    val fin = Window.partitionBy(gcols: _*).orderBy(order: _*)
    df.withColumn("__prk", row_number().over(pre)).filter(col("__prk") <= k)
      .drop("__prk")
      .withColumn(rkName, row_number().over(fin)).filter(col(rkName) <= k)
  }
}
