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
  * width, not the group size — UNLESS the distribution is pathological
  * (one outlier stretches the range so nearly all mass lands in one
  * bucket). For that case a SECOND histogram level runs inside any
  * target bucket whose count exceeds [[Quantile.Level2Threshold]]:
  * re-bucket the bucket's rows over the bucket's ACTUAL value range
  * (min/max of its rows, not the analytic slice — so a
  * concentrated-but-narrow bucket spreads fully) and rank only inside
  * the target sub-bucket, bounding partitions at ~n/B². The gate reads
  * max bucket count off the MATERIALIZED ≤ |groups|·|ranks|-row
  * targets frame (adaptive plan choice, the AQE idea in miniature) —
  * well-shaped data never pays the extra passes or plan nodes. Equal VALUES are the irreducible floor: a bucket
  * whose rows are all one value cannot be histogram-separated on the
  * value, and falls back to the tiebreak-ordered rank over that bucket
  * (selection then only resolves WHICH tied row carries the rank — the
  * value at the rank is already determined). Rank expressions are
  * arbitrary functions of the group count n, so median ((n+1)÷2,
  * (n+2)÷2), p90 (⌈0.9n⌉) and ntile cutoffs all reuse the same
  * selection.
  */
object Quantile {

  /** Buckets per group. 1024 keeps the histogram frame trivially small
    * (|groups|·1024 rows) while bounding final-phase partitions at
    * ~0.1% of a group. */
  val Buckets = 1024

  /** A target bucket holding more rows than this goes through the
    * second histogram level before ranking. 4096 = 4·Buckets: small
    * enough that a spec-sized pathological fixture exercises the path,
    * large enough that a well-shaped bucket (~n/1024 rows) at bench
    * scale never trips it. At 100 TB the constant's exact value only
    * moves the crossover; both branches are sort-free. */
  val Level2Threshold = 4096L

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
    // __cum rides along (functionally determined by (group, __b)) so
    // the bucket's row count can gate the second histogram level.
    // MATERIALIZED (≤ |groups|·|ranks| rows): cuts the stats/hist
    // lineage out of every downstream plan (phase 4 otherwise
    // re-embeds two more full scans) and makes the gate statistic
    // below a free driver-side read.
    val targets = Dedup.materialize(
      located.groupBy(col(group), col("__b"), col("__cb"), col("__cum"))
        .agg(collect_set(col("__target")).as("__targets"))
        .withColumn("__bc", col("__cum") - col("__cb")))

    // Adaptive plan choice off the materialized bounded frame (the
    // Fuzzy fail-fast / AQE pattern — a one-row read of an already-
    // computed ≤ |groups|·|ranks|-row frame, never a corpus action):
    // only a distribution that actually HAS an oversized bucket pays
    // the second level's extra passes; well-shaped data keeps the
    // exact 3-pass plan shape.
    val maxBc = Option(targets.agg(max(col("__bc"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

    def rankIn(base: DataFrame, t: DataFrame): DataFrame = {
      // Phase 4 (direct): rank only inside target buckets. Partitions
      // hold ~n/B rows; global rank = rows before the bucket + rank
      // within it.
      val wf = Window.partitionBy(col(group), col("__b")).orderBy(v, col(tiebreakCol))
      base.join(broadcast(t), Seq(group, "__b"))
        .withColumn("__grank", col("__cb") + row_number().over(wf))
        .filter(array_contains(col("__targets"), col("__grank")))
        .drop("__lo", "__hi", "__b", "__cb", "__cum", "__bc", "__targets")
    }

    if (maxBc <= Level2Threshold) rankIn(bucketed(df), targets)
    else {
      // Second histogram level: an oversized target bucket — the
      // pathological case where an outlier stretched the group range
      // and nearly all mass collapsed into one level-1 bucket —
      // repeats the histogram INSIDE the bucket, over the bucket's
      // ACTUAL value range (min/max of its rows, so a narrow-but-dense
      // bucket spreads across all B sub-buckets). Final partitions
      // bound at ~n/B²; the local target rank is the global rank minus
      // rows before the bucket (__cb), and the global rank reassembles
      // as __cb + sub-buckets-before + rank-within-sub-bucket. The
      // oversized-bucket rows are materialized once (three consumers
      // below would otherwise each re-scan the corpus; on a cluster
      // with a checkpoint dir this is a durable cut, the
      // Dedup.materialize contract). All steering frames stay
      // ≤ |groups|·|ranks|·B rows — broadcast by construction. A
      // bucket whose rows are all ONE value degenerates to sub-bucket
      // 0 and falls back to the tiebreak-ordered rank — the
      // irreducible tie floor (the selected value is already exact;
      // only WHICH tied row carries the rank remains to resolve).
      val direct = rankIn(bucketed(df), targets.filter(col("__bc") <= Level2Threshold))
      val bigT = targets.filter(col("__bc") > Level2Threshold)
      val inBig = Dedup.materialize(
        bucketed(df).join(broadcast(bigT), Seq(group, "__b")))
      val stats2 = inBig.groupBy(col(group), col("__b"))
        .agg(min(v).as("__lo2"), max(v).as("__hi2"))
      val b2 = inBig.join(broadcast(stats2), Seq(group, "__b"))
        .withColumn("__b2",
          when(col("__hi2") === col("__lo2"), lit(0L))
            .otherwise(least(
              floor((v - col("__lo2")) * lit(Buckets.toDouble) / (col("__hi2") - col("__lo2"))),
              lit(Buckets - 1L)).cast("long")))
      val hist2 = b2.groupBy(col(group), col("__b"), col("__b2"))
        .agg(count(lit(1)).as("__c2"), first(col("__cb")).as("__cb1"),
          first(col("__targets")).as("__ts"))
      val wc2 = Window.partitionBy(col(group), col("__b")).orderBy("__b2")
      val located2 = hist2
        .withColumn("__cum2", sum(col("__c2")).over(wc2))
        .withColumn("__cb2", col("__cum2") - col("__c2"))
        .select(col(group), col("__b"), col("__b2"), col("__cb1"), col("__cb2"),
          col("__cum2"), explode(col("__ts")).as("__t"))
        .filter(col("__cb2") < col("__t") - col("__cb1") &&
          col("__t") - col("__cb1") <= col("__cum2"))
      val targets2 = located2
        .groupBy(col(group), col("__b"), col("__b2"), col("__cb1"), col("__cb2"))
        .agg(collect_set(col("__t")).as("__t2"))
      val wf2 = Window.partitionBy(col(group), col("__b"), col("__b2"))
        .orderBy(v, col(tiebreakCol))
      val refined = b2.join(broadcast(targets2), Seq(group, "__b", "__b2"))
        .withColumn("__grank", col("__cb1") + col("__cb2") + row_number().over(wf2))
        .filter(array_contains(col("__t2"), col("__grank")))
        .select(direct.columns.map(col): _*)
      direct.unionByName(refined)
    }
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
