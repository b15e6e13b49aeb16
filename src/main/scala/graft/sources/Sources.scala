package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the parquet loaders in [[graft.Tables]]
  * (SURVEY §2.1 S-2, §2.2 K-4).
  *
  * CSV reads take an explicit schema: at 100 TB, schema inference is a
  * full extra pass over the data and type drift between files becomes
  * silent corruption — the reference validates required input columns
  * up front for the same reason (/root/reference/server.py:309-313). */
object Sources {

  /** S-2: CSV scan (header + explicit schema, no inference job). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines scan (the pretraining-corpus interchange format) with
    * an explicit schema — same no-inference rule as CSV: inference is a
    * full extra pass, and `columnNameOfCorruptRecord` rows surface
    * malformed lines instead of silently dropping them. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan with an explicit schema — the other columnar interchange
    * format warehouses hand over (Spark-native reader, same pushdown /
    * pruning machinery as parquet); the no-inference rule applies the
    * same way. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** P-6: schema-subset pre-flight check (server.py:309-313) — fail
    * before any job runs, not after a day of cluster time. */
  def requireColumns(df: DataFrame, required: Set[String]): DataFrame = {
    val missing = required -- df.columns.toSet
    require(missing.isEmpty, s"input is missing required columns: ${missing.mkString(", ")}")
    df
  }
}

/** K-4: JSON-rows materialization (server.py:372-374's /results dump —
  * as a distributed column, never a driver-side collect). */
object Sinks {
  def jsonRows(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(to_json(struct(df.columns.map(col): _*)).as("json")).as[String]
  }
}
