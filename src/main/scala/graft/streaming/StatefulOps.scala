package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** X-24 custom keyed state (mapGroupsWithState), promoted from the
  * spec-only counter to a registered, oracle-checked per-user state
  * machine: running event count, 30-minute-gap session count, exact
  * value cents, and the latest event type. ONE transition function
  * ([[fold]]) is executed by both the batch registry form
  * (`user_state_machine` — mapGroupsWithState runs on a batch Dataset
  * with each key's full slice and empty initial state) and the
  * streaming micro-batch form (state carried in the state store), so
  * the batch-replay equivalence the X-58 discipline requires is a
  * property of shared code, pinned by StatefulOpsSpec through real
  * micro-batch execution.
  *
  * Replay contract: [[fold]] is a left fold over (ts, event_id)-sorted
  * events, so micro-batch ≡ batch holds when batches respect event-time
  * order per user (the streaming deployment pairs it with a watermark
  * + sorted replay, the standard state-machine ingestion discipline).
  *
  * Scale shape: one shuffle on user_id; O(1) state per user (five
  * scalars); typed JVM execution is the cost of arbitrary state — this
  * operator class exists precisely where codegen'd aggregates can't
  * express the transition (reference anchor: the shared-dict progress
  * state of server.py:69-75). */
object StatefulOps {
  /** `value` is Option: real event streams carry null metrics (the r11
    * adversarial corpus does), and a primitive Double field turns the
    * typed conversion into NOT_NULL_ASSERT_VIOLATION at runtime. A
    * null value contributes NOTHING to value_cents — the SQL-aggregate
    * convention (SUM skips NULL), mirrored with COALESCE(...,0) in the
    * oracle so an all-null user reads 0, like this fold's zero state. */
  case class EvRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Option[Double])
  case class UserState(nEvents: Long, nSessions: Long, lastTsMs: Long,
      valueCents: Long, lastEventId: Long, lastType: String)

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Exact cents via DECIMAL(12,2) HALF_UP — the JVM mirror of the
    * engine-wide Exact.cents cast (and the oracle's
    * CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)). */
  def cents(v: Double): Long =
    new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** The state transition: fold a user's new events (sorted by
    * (ts, event_id) — within-batch arrival order is not deterministic)
    * onto the prior state. A session opens on the first event or a
    * strictly-greater-than-30-minute gap. */
  def fold(prev: Option[UserState], evs: Seq[EvRow]): UserState =
    evs.sortBy(e => (e.ts.getTime, e.event_id))
      .foldLeft(prev.getOrElse(
        UserState(0L, 0L, Long.MinValue, 0L, Long.MinValue, ""))) { (st, e) =>
        val tms = e.ts.getTime
        val opens = st.nEvents == 0L || tms - st.lastTsMs > SessionGapMs
        // the last_* fields follow max (ts, event_id), NOT arrival
        // order: two equal-timestamp events split across micro-batches
        // each satisfy the event-time-order contract, and the carried
        // lastEventId exists precisely to break that tie the same way
        // the batch replay (and the oracle's ORDER BY ts DESC,
        // event_id DESC) does
        val latest = tms > st.lastTsMs ||
          (tms == st.lastTsMs && e.event_id > st.lastEventId)
        UserState(st.nEvents + 1,
          st.nSessions + (if (opens) 1L else 0L),
          math.max(tms, st.lastTsMs),
          st.valueCents + e.value.map(cents).getOrElse(0L),
          if (latest) e.event_id else st.lastEventId,
          if (latest) e.event_type else st.lastType)
      }

  /** The keyed-state query over an event frame (batch or streaming
    * micro-batch — same code, same plan family): one output row per
    * user with the folded state. */
  def userStates(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[EvRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[EvRow], state: GroupState[UserState]) =>
          val st = fold(state.getOption, evs.toSeq)
          state.update(st)
          (user, st.nEvents, st.nSessions, st.valueCents, st.lastType)
      }
      .toDF("user_id", "n_events", "n_sessions", "value_cents", "last_type")
  }
}
