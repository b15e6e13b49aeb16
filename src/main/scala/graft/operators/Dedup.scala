package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline (M3 extension
  * scope): exact hashing, word-shingle Jaccard, MinHash+LSH banding, and
  * SimHash — the standard near-dup toolbox at corpus scale.
  *
  * Scale posture (100 TB): nothing here is an all-pairs comparison.
  *  - Exact dedup is one hash-partitioned groupBy.
  *  - Shingle-Jaccard joins on a shingle equi-key with a size-band prune
  *    in the join condition, so the shuffle carries (shingle, doc) pairs
  *    — never a cartesian of documents.
  *  - MinHash collapses each document to k integers; candidates come
  *    from an equi-join on band keys (b bands of r rows), and only the
  *    tiny candidate set pays the exact-verification cost.
  *  - SimHash is a per-row fold, embarrassingly parallel.
  * All hashes derive from md5 hex prefixes ([[TextAnalysis.tokenHash]]),
  * so every step is reproducible in the DuckDB oracle.
  */
object Dedup {
  import TextAnalysis.{tokenHash, HashMod}

  /** Distinct word n-gram shingles of a token array (n consecutive
    * tokens joined by a space). Shorter-than-n documents → empty set. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** MinHash constants: k universal-hash pairs (a_i, b_i), fixed and
    * odd so they're coprime-ish with the modulus; embedded literally in
    * the oracle SQL too. */
  val MinHashK = 16
  val MinHashA: Seq[Long] = (0 until MinHashK).map(i => (2L * i + 1) * 104729L % HashMod)
  val MinHashB: Seq[Long] = (0 until MinHashK).map(i => (i + 1) * 7919L % HashMod)

  /** MinHash signature: one column per hash function, min over the
    * shingle-hash set of (a·h + b) mod P. Products stay < 1e18, inside
    * a long. */
  def minhashSig(shingleHashes: Column): Seq[Column] =
    (0 until MinHashK).map { i =>
      array_min(transform(shingleHashes,
        h => (lit(MinHashA(i)) * h + lit(MinHashB(i))) % lit(HashMod)))
        .as(s"mh$i")
    }

  /** LSH band keys over a MinHash signature row: b bands of r rows,
    * each band key the joined signature slice. Documents sharing any
    * band key become candidate pairs. */
  def bandKeys(bands: Int, rows: Int): Seq[Column] =
    (0 until bands).map { b =>
      concat_ws("-", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*).as(s"band$b")
    }

  /** Exact Jaccard over two distinct-element arrays, computed with
    * integer set sizes (|A∩B| / (|A|+|B|−|A∩B|)) so both engines derive
    * the double from identical ints. */
  def jaccard(a: Column, b: Column): Column = {
    val common = size(array_intersect(a, b))
    common.cast("double") / (size(a) + size(b) - common).cast("double")
  }

  /** 16-bit SimHash over a (multiset) token-hash array: bit j is set
    * when the sum of ±1 votes from each hash's bit j is positive. */
  val SimHashBits = 16
  def simhash(tokenHashes: Column): Column =
    (0 until SimHashBits).map { j =>
      val vote = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** doc_id + distinct shingle set + shingle-hash array, the shared
    * input frame for the Jaccard/MinHash pipelines. */
  def shingled(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("toks", TextAnalysis.tokens(TextAnalysis.norm(col("text"))))
      .withColumn("ss", shingles(col("toks"), n))
      .withColumn("hs", transform(col("ss"), t => tokenHash(t)))
      .select("doc_id", "ss", "hs")
}
