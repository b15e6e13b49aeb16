package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partitioned-directory transparency proof (round-8 item #3).
  *
  * `Tables.scala` claims the loaders are layout-agnostic — locally each
  * table is a single parquet file, on a cluster the same path is a
  * hive-partitioned directory. Until now every spec only ever read the
  * single-file layout. This spec RE-LAYS sf0.001 as partitioned
  * directories over EXISTING columns (orders by o_orderpriority,
  * documents by lang, events by event_type — hive layout re-derives the
  * column from directory names, so the read-back schema is identical),
  * then runs a representative registered query per family COMPLETELY
  * UNCHANGED against the re-laid directory and asserts result equality
  * with the single-file layout, plus partition pruning in the plan for
  * partition-column predicates.
  */
class PartitionedLayoutSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  /** sf0.001 re-laid under a temp dir: three tables hive-partitioned,
    * the rest byte-identical copies — queries read it via the SAME
    * `Tables` loaders with no code change. */
  private lazy val laid: String = {
    val dir = Files.createTempDirectory("graft-hive").toString
    def copy(name: String, partCols: Seq[String]): Unit = {
      val df = Tables.table(spark, src, name)
      val w = df.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
        .parquet(s"$dir/$name.parquet")
    }
    copy("orders", Seq("o_orderpriority"))
    copy("documents", Seq("lang"))
    // events: normalizeTs must run BEFORE the re-write or the copy
    // would re-encode the raw nanos long; write the normalized form
    Tables.events(spark, src).write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$dir/events.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "lineitem",
      "embeddings").foreach(copy(_, Seq.empty))
    dir
  }

  /** One registered query per family (star join, exact quantile, dedup,
    * events, text) — run verbatim on both layouts, rows must match. */
  private val representative = Seq(
    "revenue_by_nation",     // star join over customer/orders/nation
    "median_order_value",    // two-phase quantile over partitioned orders
    "minhash_lsh",           // banded dedup over partitioned documents
    "conversion_funnel",     // event sequencing over partitioned events
    "text_quality")          // per-doc scoring over partitioned documents

  for (q <- representative)
    test(s"$q runs unchanged on the hive-partitioned layout") {
      val base = SparkEntry.queries(q)(spark, src)
      val part = SparkEntry.queries(q)(spark, laid)
      // identical output schema (partition columns must NOT leak extra
      // or reordered columns through the query's final projection)
      part.schema.fieldNames.toSeq shouldEqual base.schema.fieldNames.toSeq
      // row multiset equality, order-insensitively (the driver gate
      // sorts rows before hashing; tie order within an ORDER BY is not
      // part of the contract)
      part.collect().map(_.toString).sorted.toSeq shouldEqual
        base.collect().map(_.toString).sorted.toSeq
    }

  test("a partition-column predicate prunes at the scan on every re-laid table") {
    for ((table, colName, value) <- Seq(
        ("orders", "o_orderpriority", "1-URGENT"),
        ("documents", "lang", "en"),
        ("events", "event_type", "purchase"))) {
      val df = Tables.table(spark, laid, table)
        .filter(col(colName) === value)
      val plan = df.queryExecution.executedPlan.toString
      withClue(s"$table/$colName: ") {
        plan should include("PartitionFilters")
        plan should include(colName)
        // the pruned scan must carry NO data-side pushed filter on the
        // partition column (it is resolved entirely from directory names)
        df.count() shouldEqual
          Tables.table(spark, src, table).filter(col(colName) === value).count()
      }
    }
  }

  test("a month=... derived-column layout prunes partitions by COUNT in the plan (r13)") {
    // The layout every 100 TB fact table actually ships: a time-derived
    // partition column (month=yyyy-MM) over lineitem (from l_shipdate)
    // and events (from ts). Unlike the existing-column re-lay above,
    // the partition column here is DERIVED at write time and must be
    // dropped on read before a registered query sees the table — this
    // pins (a) the write recipe, (b) that a month predicate prunes at
    // the SCAN, asserted from the FileSourceScanExec's selected
    // partition COUNT, not just the PartitionFilters string, and (c)
    // that pruning reads strictly fewer partitions than the full scan.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = Files.createTempDirectory("graft-month").toString
    // lineitem by month (83 directories at this SF); events span only
    // one month of synthetic time, so they take the finer day=
    // granularity a streaming sink would use (30 directories)
    val cases = Seq(
      ("lineitem", "month", "yyyy-MM",
        Tables.table(spark, src, "lineitem"), col("l_shipdate")),
      ("events", "day", "yyyy-MM-dd", Tables.events(spark, src), col("ts")))
    for ((table, pcol, fmtStr, srcDf, tsCol) <- cases)
      srcDf.withColumn(pcol, date_format(tsCol, fmtStr))
        .write.mode("overwrite").partitionBy(pcol)
        .parquet(s"$dir/$table.parquet")
    def scanPartitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: FileSourceScanExec => f.selectedPartitions.partitionCount
      }.sum
    for ((table, pcol, fmtStr, srcDf, tsCol) <- cases) {
      val full = spark.read.parquet(s"$dir/$table.parquet")
      val nParts = full.select(pcol).distinct().count()
      nParts should be > 1L // the assertions below need >1 partition to prune
      // hive layout type-INFERS partition values (day=2024-01-01 reads
      // back as DATE) — extract values through an explicit string cast
      val first = full.select(col(pcol).cast("string").as("p"))
        .orderBy("p").limit(1).collect().head.getString(0)
      val pruned = full.filter(col(pcol) === first)
      withClue(s"$table: ") {
        // the plan proves it: exactly 1 of `nParts` partitions read
        scanPartitions(pruned) shouldEqual 1
        scanPartitions(full) shouldEqual nParts.toInt
        val plan = pruned.queryExecution.executedPlan.toString
        plan should include("PartitionFilters")
        // and the pruned read returns exactly the rows the single-file
        // layout finds by deriving + filtering the same period
        pruned.count() shouldEqual
          srcDf.filter(date_format(tsCol, fmtStr) === first).count()
        // range predicates prune too — the incremental-job shape
        // (period >= watermark): only the max directory is read
        val cut = full.select(max(col(pcol).cast("string")))
          .collect().head.getString(0)
        scanPartitions(full.filter(col(pcol) >= cut)) shouldEqual 1
        // layout-agnostic once the derived column is dropped back out
        full.drop(pcol).count() shouldEqual srcDf.count()
      }
    }
  }

  test("partition values with spaces and mixed charsets round-trip the directory encoding") {
    // '4-NOT SPECIFIED' URL-encodes in the directory name; the read
    // back must restore the exact string or every downstream group-by
    // on the column silently fragments
    val vals = Tables.table(spark, laid, "orders")
      .select("o_orderpriority").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    vals shouldEqual Tables.table(spark, src, "orders")
      .select("o_orderpriority").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    vals should contain("4-NOT SPECIFIED")
  }
}
