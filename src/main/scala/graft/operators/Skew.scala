package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join for hot keys (SURVEY §7.5's 100 TB
  * posture; AQE's skew-join split handles sort-merge joins at runtime,
  * but a salted join is the explicit, planner-independent tool when one
  * build-side key dominates — e.g. a null-ish default user owning 10%
  * of a 100 TB event table).
  *
  * Shape: the probe (large, skewed) side gets a random salt in
  * [0, buckets); the build side is exploded `buckets`× with every salt
  * value; the join key becomes (key, salt), spreading each hot key over
  * `buckets` reducers. Result rows are identical to the unsalted join
  * (pinned in SkewSpec) — salting changes partitioning, not semantics.
  * `rand(seed)` keeps runs reproducible. */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = 8, seed: Long = 42L): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // withColumn would silently OVERWRITE a pre-existing __salt column
    // (and the final drop would remove the user's column) — wrong rows
    // or lost data with no error; fail fast instead
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val salted = fact.withColumn("__salt",
      (rand(seed) * buckets).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
