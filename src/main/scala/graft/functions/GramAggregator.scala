package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass dense Gram-matrix accumulation Σ_v q qᵀ over a quantized
  * embedding column — the `treeAggregate`-shaped moment computation
  * MLlib's RowMatrix uses for its Gramian, expressed as a typed
  * [[Aggregator]] so Catalyst plans it as a regular partial/final
  * aggregate: every task folds its rows into ONE d² long buffer
  * (d=64 → 32 KB), merge is elementwise add, and the corpus shuffles
  * nothing but |partitions| buffers. The declarative alternative —
  * explode to (i, qᵢ) and self-join on the row id — shuffles 64n rows
  * against 64n rows to rebuild the very products this buffer folds
  * locally.
  *
  * Exactness: inputs are fixed-point longs (|q| ≤ 1e4 for unit-range
  * embeddings), so products ≤ 1e8 and the sums stay inside a long
  * through ~10¹⁰ rows; reduce/merge are commutative/associative
  * integer adds — order-independent, hence hash-comparable with the
  * oracle. Beyond long range, shard the corpus and merge per-shard
  * Gram frames in DECIMAL (the incremental_agg algebra).
  */
class GramAggregator(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * d)

  override def reduce(b: Array[Long], q: Seq[Long]): Array[Long] = {
    val a = q.toArray
    // Without this, a short row throws a bare AIOOBE from deep in the
    // aggregate and a long row is silently truncated — both far from
    // the actual cause (a row whose embedding width ≠ the declared d).
    require(a.length == d,
      s"GramAggregator(d=$d): input row has ${a.length} elements")
    var i = 0
    while (i < d) {
      val qi = a(i)
      if (qi != 0L) {
        val row = i * d
        var j = 0
        while (j < d) { b(row + j) += qi * a(j); j += 1 }
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < b1.length) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
