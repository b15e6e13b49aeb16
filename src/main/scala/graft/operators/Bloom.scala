package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Columnar Bloom filter for join pruning (X-66).
  *
  * The 100 TB problem: a semi join of a huge fact table against a
  * filtered dimension subset shuffles every fact row that *might*
  * match — at scale, almost all of that shuffle is wasted on rows the
  * join will drop. Engines solve it with runtime filters (Spark's
  * row-level runtime filtering, Parquet bloom pruning); this operator
  * expresses the same idea declaratively so the pruning is visible,
  * measurable, and oracle-checkable:
  *
  *  1. build: hash every build-side key into K positions of an M-bit
  *     filter, materialized as ≤ M/32 `(word, bits)` rows by a single
  *     `bit_or` aggregation (the partial phase collapses each task to
  *     at most M/32 cells — fixed size regardless of key count), then
  *     folded into a ONE-ROW map (≤ 2 KB here) that broadcasts for
  *     free;
  *  2. probe: each fact row recomputes its K positions and tests the
  *     bits with `element_at` + bitwise AND — a NARROW filter, no
  *     shuffle, applied before any join;
  *  3. the exact semi join then runs only on surviving rows: false
  *     positives (rate ≈ (1−e^(−K·n/M))^K) are removed, so the final
  *     result is EXACT — the bloom only cut the join's input.
  *
  * All hashing is md5-derived ([[TextAnalysis.tokenHash]]) plus
  * universal-hash constants that the oracle SQL embeds verbatim, so
  * DuckDB reproduces every bit — including the realized
  * false-positive counts. M here is sized small (4096 bits) so the
  * false-positive columns are non-trivially exercised at test scale;
  * a deployment sizes M ≈ 10·n bits for ~1% FP, and the build stays
  * one fixed-size aggregation either way.
  */
object Bloom {
  /** Filter size in bits. Deliberately small (see class doc): at the
    * three test scales the build side is ~12 / ~100 / ~800 keys, so
    * 4096 bits realizes FP rates of ~0% / ~0.2% / ~10% — the
    * false-positive columns are non-trivially exercised without the
    * filter ever saturating. */
  val Bits = 4096L
  /** Number of hash functions. */
  val K = 2
  /** Universal-hash constants, embedded identically in the oracle. */
  val A = Seq(999983L, 785857L)
  val B = Seq(337L, 54321L)
  val P: Long = TextAnalysis.HashMod

  /** md5-derived base hash of a (stringified) key — bit-identical in
    * DuckDB via CAST('0x' || substr(md5(k), 1, 14) AS BIGINT) % P. */
  def keyHash(key: Column): Column = TextAnalysis.tokenHash(key.cast("string"))

  /** Bit position of hash i for base hash `h`: ((A·h + B) mod P) mod M.
    * A·h < 2^20 · 2^30 < 2^50 — no overflow in either engine. */
  def bitPos(h: Column, i: Int): Column =
    (lit(A(i)) * h + lit(B(i))) % lit(P) % lit(Bits)

  /** Words are 32 bits: every mask stays in positive BIGINT range in
    * both engines (1 << 31 < 2^63), and bit_or never touches the sign
    * bit. */
  private def word(pos: Column): Column = shiftright(pos, 5)

  /** 2^(pos mod 32) via a literal lookup array — the Column-level
    * shiftleft only takes a constant shift, and a 32-element literal
    * array (indexed 1-based over [1, 32]) keeps the whole expression
    * codegen-friendly. */
  private val Pow2: Column = array((0 until 32).map(b => lit(1L << b)): _*)
  private def mask(pos: Column): Column =
    element_at(Pow2, (pos % lit(32L)).cast("int") + lit(1))

  /** One-row DataFrame with a single `bloom: map<bigint, bigint>`
    * column (word index → 32-bit word), built from `keys(keyCol)`. */
  def build(keys: DataFrame, keyCol: String): DataFrame = {
    val h = keyHash(col(keyCol))
    keys
      // a null key hashes to null positions → a null map key, which
      // throws NULL_MAP_KEY in map_from_entries; nulls can never pass
      // the exact equi join this filter fronts, so drop them here
      .filter(col(keyCol).isNotNull)
      .select(explode(array((0 until K).map(i => bitPos(h, i)): _*)).as("__pos"))
      .select(word(col("__pos")).as("__word"), mask(col("__pos")).as("__mask"))
      .groupBy("__word")
      .agg(expr("bit_or(__mask)").as("__bits"))
      .groupBy()
      .agg(collect_list(struct(col("__word"), col("__bits"))).as("__entries"))
      .select(map_from_entries(col("__entries")).as("bloom"))
  }

  /** Membership test of `key` against the `bloom` map column: all K
    * bits set. An absent word ⇒ element_at yields NULL ⇒ the AND is
    * NULL ⇒ a filter on this drops the row — a definite miss, as it
    * should be. */
  def mightContain(bloomMap: Column, key: Column): Column = {
    val h = keyHash(key)
    (0 until K).map { i =>
      val pos = bitPos(h, i)
      element_at(bloomMap, word(pos)).bitwiseAND(mask(pos)) > 0
    }.reduce(_ && _)
  }

  /** DuckDB fragments mirroring the hashes above. */
  def sqlKeyHash(k: String): String =
    s"(CAST('0x' || substr(md5(CAST($k AS VARCHAR)), 1, 14) AS BIGINT) % $P)"
  def sqlBitPos(h: String, i: Int): String =
    s"((${A(i)} * $h + ${B(i)}) % $P % $Bits)"
}
