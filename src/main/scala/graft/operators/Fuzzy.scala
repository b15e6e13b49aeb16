package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) entity matching on a DISTINCT value domain
  * (X-43). Pairwise Levenshtein is quadratic by nature, so it is only
  * sound on a bounded domain — and "bounded" must be ENFORCED, not
  * assumed: pointed at an unbounded column (urls, free text) the
  * nested-loop join silently becomes n², the classic slow-job-that-
  * should-have-failed-fast. [[pairsWithinDistance]] counts the
  * distinct domain first (one agg over a frame this operator is about
  * to self-join anyway — the guard costs one tiny job) and throws past
  * `spark.graft.fuzzy.maxDomain` (default 10000 ≈ 5·10⁷ comparisons),
  * naming the blocked near-dup family (X-7 ngram_jaccard / X-8
  * minhash_lsh) as the large-domain path.
  */
object Fuzzy {

  val MaxDomainKey = "spark.graft.fuzzy.maxDomain"
  val DefaultMaxDomain = 10000L

  /** Distinct values of `valueCol` within Levenshtein distance
    * `maxDist` of each other, as (s1 < s2) pairs with the distance.
    * Fails fast when the distinct domain exceeds the configured bound. */
  def pairsWithinDistance(df: DataFrame, valueCol: String,
      maxDist: Int = 1): DataFrame = {
    val spark = df.sparkSession
    val maxDomain = spark.conf.getOption(MaxDomainKey)
      .map(_.toLong).getOrElse(DefaultMaxDomain)
    val domain = df.select(valueCol).distinct()
    val n = domain.count()
    require(n <= maxDomain,
      s"fuzzy matching is quadratic: distinct($valueCol) = $n exceeds " +
        s"$MaxDomainKey = $maxDomain; use the blocked near-dup family " +
        "(ngram_jaccard / minhash_lsh) for large domains")
    domain.as("a").join(domain.as("b"),
        col(s"a.$valueCol") < col(s"b.$valueCol") &&
          levenshtein(col(s"a.$valueCol"), col(s"b.$valueCol")) <= maxDist)
      .select(col(s"a.$valueCol").as("s1"), col(s"b.$valueCol").as("s2"),
        levenshtein(col(s"a.$valueCol"), col(s"b.$valueCol")).as("dist"))
  }
}
