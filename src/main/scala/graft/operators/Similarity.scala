package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`, M3
  * extension scope): brute-force cosine top-k as the exact baseline and
  * a sign-bit LSH bucketing as the scale path.
  *
  * Cross-engine exactness: doubles summed in engine-dependent order are
  * not hash-comparable, so all dot products run in **fixed-point**:
  * each element is quantized to `floor(x · 1e7)` as a long, and the dot
  * product/norms are exact integer sums (order-independent; 64 dims ×
  * (5e6)² stays < 2^53, far inside a long). The final cosine is one
  * double division over identical integers, hence bit-identical in
  * Spark and DuckDB.
  *
  * Scale posture (100 TB): queries are broadcast (small side), so
  * brute-force scoring is a map-side nested-loop over the candidate
  * scan — no shuffle until the per-query top-k window on `q_id`. The
  * LSH variant replaces the cross product with an equi-join on bucket
  * keys. Per-query top-k is a `row_number` window, never a global sort.
  */
object Similarity {

  /** Fixed-point scale: 7 decimal digits — below float32's ~7.2 digits
    * of precision for unit-range values, so quantization is faithful. */
  val Scale = 1e7

  /** Fixed-point input envelope, ENFORCED at quantization: with
    * |x| ≤ 16 every dim-64 BIGINT accumulation downstream stays exact —
    * dot ≤ 64·(16·10⁷)² ≈ 1.6·10¹⁸ and squared-L2 diffs ≤
    * 64·(32·10⁷)² ≈ 6.6·10¹⁸, both under 2⁶³ ≈ 9.2·10¹⁸. Real
    * embeddings are unit-ish; a component past 16 is a corrupted
    * encoder output, and the contract error at the scan beats an
    * ARITHMETIC_OVERFLOW forty stages later (Spark/ANSI) or a silent
    * HUGEINT widening (DuckDB) — the r11 adversarial sweep hit exactly
    * that divergence with ±10⁶ components in kcenter_seeds. */
  val MaxAbs = 16.0

  /** Quantize a float array to longs: floor(x · 1e7). Float→double is
    * exact; the product and floor round identically in both engines.
    * A native codegen'd expression ([[graft.functions.QuantizeFx]]) —
    * the `transform(arr, x -> floor(x*s))` HOF form evaluates its
    * lambda interpreted per element (boxed, closure dispatch), and
    * quantization is the hottest per-element loop in the similarity
    * family. Measured (graft.MicroBench, 2M × 64-dim vectors,
    * min-of-2): quantize+dot all-HOF 16.2 s → native dot only 0.45 s
    * → native quantize + native dot 0.18 s. The registered bench's
    * 5k-vector table can't resolve these constants above noise; a
    * billion-vector scan lives in exactly this regime. */
  def quantize(arr: Column): Column =
    graft.functions.QuantizeFx.quantize_fx(arr, Scale, MaxAbs)

  /** Exact integer dot product of two quantized arrays — a native
    * codegen'd Catalyst expression ([[graft.functions.DotProductFx]]);
    * the equivalent HOF form (`aggregate(zip_with(a,b,_*_),0,_+_)`)
    * evaluates its lambdas interpreted-per-element and is kept only as
    * the reference semantics in DotProductFxSpec. */
  def dotFx(a: Column, b: Column): Column =
    graft.functions.DotProductFx.dot_fx(a, b)

  /** Cosine from exact integer dot + norms; norms are multiplied as
    * doubles (their long product would overflow). A ZERO norm (every
    * element quantizes to 0) yields NULL rather than dividing: the
    * session runs Spark 4's default ANSI mode, where the division
    * would throw DIVIDE_BY_ZERO and kill the job on one degenerate
    * vector — null instead drops the row at any cos-threshold filter
    * (cosine is undefined for the zero vector). The fixtures contain
    * no zero-norm vectors, so oracle parity is unaffected. */
  def cosFx(dot: Column, na: Column, nb: Column): Column =
    when(na === 0 || nb === 0, lit(null).cast("double"))
      .otherwise(dot.cast("double") / sqrt(na.cast("double") * nb.cast("double")))

  /** Sign-bit LSH bucket: bit i set when dimension i is non-negative —
    * random-hyperplane hashing with axis-aligned planes. `bits` controls
    * the bucket count (2^bits), bounded to a long's sign-free bit range:
    * past 63, `1L << i` wraps mod 64 and the arithmetic sum would carry
    * aliased bits into unrelated positions — silently colliding buckets
    * whose vectors disagree on the aliased dimension. */
  def signBucket(arr: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    (0 until bits)
      // null-safe 0-based get(): a truncated/corrupt vector shorter
      // than `bits` hashes its missing dimensions to the 0 branch
      // instead of throwing INVALID_ARRAY_INDEX under ANSI mode
      // (matches the probe-side access in SimilarityQueries)
      .map(i => when(get(arr, lit(i)) >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
  }
}
