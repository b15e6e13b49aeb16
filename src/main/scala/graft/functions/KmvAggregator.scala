package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. '02;
  * Beyer et al. SIGMOD '07) over pre-hashed values: the buffer keeps
  * the k SMALLEST DISTINCT hash values seen, so per-group state is
  * O(k) regardless of stream length — the mergeable fixed-size shape
  * that replaces a full distinct shuffle with one partial-collapsing
  * hash aggregate. The estimator lives engine-side (see
  * TextQueries.approx_distinct_tokens): with fewer than k distinct
  * hashes the sketch saw everything and the size IS the exact count;
  * at capacity, (k−1)·M ÷ h_k where h_k is the k-th smallest hash and
  * M the hash modulus.
  *
  * Unlike Spark's HLL++ (opaque internal registers), the sketch state
  * here is a plain sorted long array over md5-derived hashes — DuckDB
  * reproduces it bit-exactly with a window over the same hash column,
  * which is what makes the query oracle-checkable (the X-56 count-min
  * discipline applied to cardinality).
  *
  * reduce/merge are set-union-then-truncate — commutative, associative
  * and order-insensitive, so results are deterministic under any
  * partitioning. The O(k) insert scan is fine at sketch sizes (k≤256);
  * the fast path below rejects almost every row in O(1) once the
  * buffer is full.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    if (b.size == k && h >= b.last) b // common case once warm: O(1)
    else if (b.contains(h)) b
    else ((b :+ h).sorted).take(k)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Row retained by [[BottomKSampleAggregator]]: deterministic md5
  * priority, unique tiebreak key, and the carried measure value. */
case class PriRow(pri: Long, key: Long, v: Double)

/** Deterministic bottom-k uniform sample: keeps the k rows with the
  * SMALLEST (pri, key) — pri an md5-derived priority, key a unique
  * tiebreak — so the sample is a fixed-size mergeable sketch (O(k)
  * state, partial collapse per task) AND a uniform random sample of
  * the group, reproducible anywhere md5 is (the DuckDB oracle draws
  * the identical k rows with one window). Quantile estimates read off
  * the sample replace `percentile_approx`'s opaque summary state with
  * a sketch both engines agree on bit-exactly.
  *
  * The (pri, key) order is total (key unique), so reduce/merge are
  * order-insensitive and the result is deterministic under any
  * partitioning. */
class BottomKSampleAggregator(k: Int)
    extends Aggregator[PriRow, Seq[PriRow], Seq[PriRow]] {

  private def ord(r: PriRow): (Long, Long) = (r.pri, r.key)
  private val O = implicitly[Ordering[(Long, Long)]]

  override def zero: Seq[PriRow] = Seq.empty

  override def reduce(b: Seq[PriRow], a: PriRow): Seq[PriRow] =
    if (b.size == k && O.gteq(ord(a), ord(b.last))) b // O(1) warm fast path
    else ((b :+ a).sortBy(ord)).take(k)

  override def merge(b1: Seq[PriRow], b2: Seq[PriRow]): Seq[PriRow] =
    (b1 ++ b2).sortBy(ord).take(k)

  override def finish(r: Seq[PriRow]): Seq[PriRow] = r

  override def bufferEncoder: Encoder[Seq[PriRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PriRow]]()
  override def outputEncoder: Encoder[Seq[PriRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PriRow]]()
}
