package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` in the same key group — composed from built-in
  * operators (SURVEY §7.4 preference (a)): tag both sides, union,
  * and take `last(value, ignoreNulls)` over a (key)-partitioned window
  * ordered by (ts, tag, tiebreak).
  *
  * Scale posture: ONE shuffle on the key and a linear window pass —
  * never the range-join blowup of `l.ts >= r.ts` theta-joins (which
  * Spark plans as a broadcast nested loop or cartesian). Right rows
  * sort before left rows at equal timestamps (inclusive `<=`), and
  * `tiebreak` makes the winner among equal right timestamps
  * deterministic (greatest wins).
  *
  * Contracts the caller owns:
  *  - `tiebreak` must be UNIQUE and NON-NULL among a key's equal-ts
  *    right rows (the registered callers pass event/order ids). Null
  *    tiebreaks sort NULLS FIRST and duplicate ones tie the whole
  *    window order, so the "winner" degrades to shuffle arrival order
  *    — nondeterministic output, not an error.
  *  - the window sorts each KEY's full left+right history in one task:
  *    bounded per-entity history (users, orders) is the designed
  *    domain. A pathologically hot key (one bot user with billions of
  *    events) funnels that task; the remedy at that shape is per-key
  *    time-slicing (rank inside time buckets, carry each bucket's last
  *    right row forward — the Quantile.selectRanks composition), which
  *    no registered query needs on its entity-keyed data.
  */
object AsOf {

  /** @param rightVals right-side value columns to carry (emitted as
    *                  `asof_<name>`)
    * @param tiebreak  right-side column ordering equal-ts right rows;
    *                  the greatest value wins */
  def joinPrior(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tiebreak: String): DataFrame = {
    val leftStruct = StructType(left.schema.fields)
    val tbType = right.schema(tiebreak).dataType
    // Right values travel as ONE struct so the window picks the latest
    // right ROW atomically — per-column last(ignoreNulls) would stitch
    // together fields from different right rows whenever the latest row
    // has a null in one value column. A right row's struct is non-null
    // even when every field inside it is null.
    val rightStruct = StructType(rightVals.map(v => right.schema(v)))
    val lpart = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag"),
      lit(null).cast(tbType).as("__tb"),
      struct(left.columns.map(col): _*).as("__left"),
      lit(null).cast(rightStruct).as("__right"))
    // SQL as-of semantics: right.ts <= left.ts is UNKNOWN for a null
    // timestamp (and a null key equi-matches nothing), so such right
    // rows must never be "the prior row" — but ascending NULLS FIRST
    // ordering would sort them to the partition head where
    // last(ignoreNulls) fabricates them as matches for early left
    // rows. Drop them up front. (A null-ts LEFT row then sorts first
    // with no preceding right row → asof_* null, also correct.)
    val rpart = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag"),
      col(tiebreak).as("__tb"),
      lit(null).cast(leftStruct).as("__left"),
      struct(rightVals.map(col): _*).as("__right"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lpart.unionByName(rpart)
      .withColumn("__asof", last(col("__right"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__left.*") +:
        rightVals.map(v => col("__asof").getField(v).as(s"asof_$v")): _*)
  }
}
