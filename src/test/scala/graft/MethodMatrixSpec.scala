package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r11: dedup_method_matrix moved to the shared-artifact form (ONE
  * materialized shingle base feeding both AllPairs arms). This spec is
  * the row-identity proof the verdict asked for: the composite output
  * must equal the matrix recomputed from the REGISTERED standalone
  * siblings — the old form, kept here as the reference derivation. */
class MethodMatrixSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("shared-artifact matrix ≡ the sibling-derived matrix, row for row") {
    val defs = graft.queries.DedupQueries.defs
    val docs = Tables.documents(spark, sf)
    // the OLD derivation: each arm from its registered sibling
    val ex = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("m0", min(col("doc_id")).over(Window.partitionBy("h")))
      .filter(col("doc_id") =!= col("m0")).select("doc_id")
    val jr = defs("dedup_clusters")(spark, sf)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val sr = defs("simhash_neardup")(spark, sf)
      .select(col("d2").as("doc_id")).distinct()
    val cr = defs("containment_dup")(spark, sf)
      .select(col("d2").as("doc_id")).distinct()
    val tagged = ex.withColumn("m", lit("exact"))
      .unionByName(jr.withColumn("m", lit("jaccard")))
      .unionByName(sr.withColumn("m", lit("simhash")))
      .unionByName(cr.withColumn("m", lit("containment")))
    val methods = spark.sql(
      "SELECT * FROM VALUES ('containment'), ('exact'), ('jaccard'), ('simhash') AS t(m)")
    val grid = methods.select(col("m").as("m1"))
      .crossJoin(methods.select(col("m").as("m2")))
      .filter(col("m1") <= col("m2"))
    val ov = tagged.select(col("doc_id"), col("m").as("m1"))
      .join(tagged.select(col("doc_id"), col("m").as("m2")), "doc_id")
      .filter(col("m1") <= col("m2"))
      .groupBy("m1", "m2").agg(count(lit(1)).as("n"))
    val oldForm = grid.join(ov, Seq("m1", "m2"), "left")
      .select(col("m1"), col("m2"), coalesce(col("n"), lit(0L)).as("n_common"))
      .orderBy("m1", "m2")
      .collect().toSeq
    val newForm = defs("dedup_method_matrix")(spark, sf).collect().toSeq
    newForm shouldEqual oldForm
    // the matrix is non-degenerate on this corpus: some arm finds dups
    assert(newForm.exists(r => r.getLong(2) > 0))
  }
}
