package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-module registries under graft.queries;
  * every entry has matching-column DuckDB oracle SQL unless the operator
  * isn't SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    DocQueries,
    RelationalQueries,
    LinkQueries,
    EventQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    EnrichQueries,
  )

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's complete pipeline — extraction, mock enrichment,
    * flatten, 14-column ordered materialization. */
  def entry(spark: SparkSession): DataFrame =
    queries("leadsight_pipeline")(spark, "/root/testdata/sf0.001")

  /** Merge module maps, failing fast if two modules register the same
    * name (toMap would silently keep the last one and could pair a query
    * with another module's oracle). */
  private def merged[V](parts: Seq[Map[String, V]]): Map[String, V] = {
    val all = parts.flatten
    val dups = all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate query names across modules: ${dups.mkString(", ")}")
    all.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(modules.map(_.defs))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged(modules.map(_.oracle))
}
