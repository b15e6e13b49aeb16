package graft

import org.apache.spark.sql.SparkSession

/** One place for session-wide configuration so Verify, Bench, and the
  * test session can't drift apart.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` belongs here (not inside a
  * table loader): it must hold before the first parquet footer is read,
  * and setting it lazily from a getter was a hidden global side effect.
  * It is a no-op on testdata generations that write TIMESTAMP(MICROS)
  * — [[graft.Tables.normalizeTs]] absorbs either physical type — but
  * stays set so a nanos-era dataset still loads.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
