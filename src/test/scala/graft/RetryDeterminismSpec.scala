package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Shared fault-injection state. Local mode runs tasks in the driver
  * JVM, so a static flag/counter is visible to task closures without
  * accumulator machinery (whose updates from FAILED tasks are dropped
  * by design — exactly the ones this spec needs to count, hence the
  * listener-based assertion as well). */
object RetryFault {
  val enabled = new AtomicBoolean(false)
  val fired = new AtomicLong(0L)
}

/** Determinism under task retry (round-9 verdict item #4).
  *
  * The engine's determinism disciplines — md5 draws instead of rand(),
  * floored integer division, total tie-break chains, the globalRank
  * materialization — all claim that a RE-EXECUTED task reproduces its
  * partition byte-for-byte, so a retry after a transient failure can't
  * change the answer. The oracle corpus can never reach this regime
  * (its runs are failure-free), so this spec makes it reachable:
  * inject a first-attempt-only task failure (TaskContext.attemptNumber
  * gated) into shuffle-heavy lineages and assert the output is
  * IDENTICAL to the clean run's, with a listener proving the injection
  * actually fired and tasks actually retried. The shared test session
  * runs local[4,4] (maxFailures=4) so second attempts exist.
  */
class RetryDeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Wrap `df` so the FIRST attempt of every third task of the stage
    * executing this node throws. Schema-preserving (Encoders.row), so
    * any operator pipeline accepts the wrapped frame unchanged. */
  private def faulted(df: DataFrame): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && RetryFault.enabled.get()
          && tc.attemptNumber() == 0 && tc.partitionId() % 3 == 0) {
        RetryFault.fired.incrementAndGet()
        throw new RuntimeException(
          "graft-test: injected first-attempt task failure")
      }
      it
    }(Encoders.row(df.schema))

  /** Run `mk` clean, then with injection; assert the injection fired,
    * tasks failed AND the two sorted outputs are identical. */
  private def assertRetryIdentical(name: String)(mk: DataFrame => DataFrame,
      input: => DataFrame): Unit = {
    val taskFailures = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.reason != org.apache.spark.Success) taskFailures.incrementAndGet()
    }
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    RetryFault.enabled.set(false)
    val clean = rows(mk(faulted(input)))
    spark.sparkContext.addSparkListener(listener)
    try {
      RetryFault.enabled.set(true)
      RetryFault.fired.set(0L)
      val retried = rows(mk(faulted(input)))
      Thread.sleep(1000) // task-end events post asynchronously — drain
      withClue(s"$name: injection never fired — the property was not tested: ") {
        RetryFault.fired.get() should be > 0L
      }
      withClue(s"$name: no task end reported a failure: ") {
        taskFailures.get() should be > 0L
      }
      withClue(s"$name: retried output diverged from the clean run: ") {
        retried shouldEqual clean
      }
    } finally {
      RetryFault.enabled.set(false)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("dedup pairs + connected components are hash-identical under first-attempt task failures") {
    // the dedup_clusters lineage: AllPairs candidate generation +
    // exact verify + iterative pointer-jumping CC, faulted at the
    // corpus scan (the stage every shuffle hangs off)
    assertRetryIdentical("dedup_clusters")(
      docs => {
        val pairs = operators.Dedup.jaccardPairs(docs, 0.5)
        operators.Dedup.connectedComponents(pairs.select("d1", "d2"))
      },
      Tables.documents(spark, sf).select("doc_id", "text"))
  }

  test("connected components are retry-deterministic when the EDGE frame's stage fails") {
    // fault downstream of candidate generation: the iterative CC loop
    // re-reads its materialized edge frame every round — a retried
    // edge-stage task must regenerate identical edges
    assertRetryIdentical("cc_edges")(
      pairs => operators.Dedup.connectedComponents(pairs),
      operators.Dedup.jaccardPairs(
        Tables.documents(spark, sf).select("doc_id", "text"), 0.5)
        .select("d1", "d2"))
  }

  test("globalRank assigns identical ids under first-attempt task failures") {
    // the global_ids lineage: range repartition samples boundaries per
    // execution and the operator's internal materialization pins them;
    // a retried task must land every row in the same range bucket and
    // local order
    assertRetryIdentical("global_ids")(
      docs => operators.Rank.globalRank(
        docs, Seq(col("lang"), col("doc_id")), "gid"),
      Tables.documents(spark, sf).select("doc_id", "lang"))
  }
}
