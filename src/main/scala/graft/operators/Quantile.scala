package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles by two-phase rank selection (X-47/X-53).
  *
  * The naive exact quantile — `row_number()` over
  * `Window.partitionBy(group)` — sorts each group in ONE task, so a
  * low-cardinality report key (5 order priorities) pins parallelism at
  * the group count forever: at 100× the data each task sorts n/5 rows
  * and spills. This operator locates each target rank without ever
  * sorting a whole group:
  *
  *  1. per-group stats (min/max/count): one parallel hash aggregate;
  *  2. histogram: bucket every row into B equal-width value buckets
  *     and count per (group, bucket) — a second parallel hash
  *     aggregate yielding ≤ |groups|·B rows;
  *  3. a running sum over that tiny frame finds, for each target rank,
  *     the single bucket whose cumulative count range covers it;
  *  4. re-scan joined against the ≤ |groups|·|ranks| target buckets
  *     (broadcast by construction) and rank ONLY inside those buckets.
  *
  * Global rank = rows-in-earlier-buckets + rank-within-bucket: exact,
  * because equal-width bucketing is monotone in the value (buckets
  * partition the value domain in order) and the in-bucket ordering
  * extends the same total order (value, then tiebreak). The final
  * window's partitions hold ~n/B rows each — bounded by the bucket
  * width, not the group size; a second histogram level inside the
  * target bucket would bound them at n/B² if a deployment ever needs
  * it. Rank expressions are arbitrary functions of the group count n,
  * so median ((n+1)÷2, (n+2)÷2), p90 (⌈0.9n⌉) and ntile cutoffs all
  * reuse the same selection.
  */
object Quantile {

  /** Buckets per group. 1024 keeps the histogram frame trivially small
    * (|groups|·1024 rows) while bounding final-phase partitions at
    * ~0.1% of a group. */
  val Buckets = 1024

  /** Integer division a ÷ b for non-negative a (row-count domain,
    * exact for a < 2^52 — doubles carry the intermediate). */
  def idiv(a: Column, b: Long): Column =
    floor(a / lit(b.toDouble)).cast("long")

  /** Rows of `df` whose global rank within their `group` — under the
    * total order (`valueCol`, then unique `tiebreakCol`) — equals any
    * of `ranks(n)`, where n is the group's row count. Output keeps all
    * input columns plus `__n` (the group count) and `__grank` (the
    * rank the row was selected at). */
  def selectRanks(df: DataFrame, group: String, valueCol: String,
      tiebreakCol: String, ranks: Column => Seq[Column]): DataFrame = {
    val v = col(valueCol)

    // Phase 1: per-group value range + count. Bounded by group
    // cardinality — broadcast by construction.
    val stats = df.groupBy(group)
      .agg(min(v).as("__lo"), max(v).as("__hi"), count(lit(1)).as("__n"))

    // Monotone equal-width bucket id; one-value groups collapse to
    // bucket 0, the top value is clamped into the last bucket.
    def bucketed(base: DataFrame): DataFrame =
      base.join(broadcast(stats), group)
        .withColumn("__b",
          when(col("__hi") === col("__lo"), lit(0L))
            .otherwise(least(
              floor((v - col("__lo")) * lit(Buckets.toDouble) / (col("__hi") - col("__lo"))),
              lit(Buckets - 1L)).cast("long")))

    // Phase 2: (group, bucket) histogram — parallel hash aggregate.
    val hist = bucketed(df).groupBy(col(group), col("__b"))
      .agg(count(lit(1)).as("__c"), first(col("__n")).as("__hn"))

    // Phase 3: locate each rank's bucket on the histogram frame. The
    // per-group window here runs over ≤ Buckets rows per group — the
    // aggregate frame, never the raw rows.
    val wc = Window.partitionBy(group).orderBy("__b")
    val located = hist
      .withColumn("__cum", sum(col("__c")).over(wc))
      .withColumn("__cb", col("__cum") - col("__c"))
      .select(col(group), col("__b"), col("__cb"), col("__cum"),
        explode(array(ranks(col("__hn")): _*)).as("__target"))
      .filter(col("__cb") < col("__target") && col("__target") <= col("__cum"))
    // One row per target bucket, carrying ALL its target ranks: a
    // plain join on (group, bucket) must not duplicate bucket rows
    // when two ranks (median's middle pair) land in the same bucket.
    val targets = located.groupBy(col(group), col("__b"), col("__cb"))
      .agg(collect_set(col("__target")).as("__targets"))

    // Phase 4: rank only inside target buckets. Partitions hold ~n/B
    // rows; global rank = rows before the bucket + rank within it.
    val wf = Window.partitionBy(col(group), col("__b")).orderBy(v, col(tiebreakCol))
    bucketed(df)
      .join(broadcast(targets), Seq(group, "__b"))
      .withColumn("__grank", col("__cb") + row_number().over(wf))
      .filter(array_contains(col("__targets"), col("__grank")))
      .drop("__lo", "__hi", "__b", "__cb", "__targets")
  }

  /** ntile(k) cumulative cutoff ranks: the first (n mod k) tiles hold
    * ⌊n/k⌋+1 rows, the rest ⌊n/k⌋, so tile i ends at rank
    * i·⌊n/k⌋ + min(i, n mod k). A row's tile is then 1 + the number
    * of cutoff-rank rows strictly below it in the total order — which
    * turns ntile into k−1 rank selections plus a broadcast compare,
    * with no per-group sort (see `RelationalQueries.customer_quartiles`). */
  def ntileCutoffs(k: Int)(n: Column): Seq[Column] = {
    val q = idiv(n, k)
    val m = n - q * k
    (1 until k).map(i => lit(i) * q + least(lit(i.toLong), m))
  }
}
