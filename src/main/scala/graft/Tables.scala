package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §2).
  *
  * Locally each table is a single parquet file; on a real cluster the same
  * path would be a partitioned parquet directory — `spark.read.parquet`
  * handles both, and all downstream operators are written against the
  * schema, not the layout, so nothing changes at 100 TB except the path.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** CPU-dense fact tables fan out to the session's parallelism when
    * the file layout can't. Parquet can't split below a row group, so a
    * locally-tiny single-row-group file scans as ONE task — and every
    * CPU-dense per-row operator downstream (regex extraction, shingle
    * md5, embedding arithmetic) runs single-threaded on a 32-core
    * session. The estimate is file-bytes / maxPartitionBytes (a file
    * listing, not a planning pass); at 100 TB a table spans thousands
    * of splits, the estimate exceeds the core count, and NO shuffle is
    * added — only the degenerate small-file layout pays one (tiny,
    * proportional-to-input) exchange. Dimension tables and
    * shuffle-soon event tables are left untouched. */
  private def fanOut(df: DataFrame, s: SparkSession, dir: String, name: String): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val bytes = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getContentSummary(path).getLength
    val maxSplit = 128L * 1024 * 1024 // spark.sql.files.maxPartitionBytes default
    if (bytes / maxSplit < p) df.repartition(p) else df
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = fanOut(table(s, d, "lineitem"), s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType directly; with `spark.sql.legacy.parquet.nanosAsLong`
    * set it arrives as nanos-since-epoch, and we convert to a microsecond
    * TimestampType column (`div` keeps the arithmetic in exact longs — a
    * double division would lose precision at ~1.7e18 ns). The conf is set
    * at session construction in [[graft.Sessions.builder]] and defensively
    * re-asserted here so the table also loads from sessions graft didn't
    * build (the driver contract passes us an arbitrary session). Oracle
    * side must CAST(ts AS TIMESTAMP) for ts-sensitive comparisons (DuckDB
    * reads native TIMESTAMP_NS). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(table(s, d, "documents"), s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(table(s, d, "embeddings"), s, d, "embeddings")
}
