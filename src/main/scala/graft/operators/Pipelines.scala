package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's complete pipeline, end to end (its §3.1 trace,
  * /root/reference/app.py:278-321): crawled text → normalize (F-4) →
  * regex extraction (F-1/F-2/F-3) → LLM enrichment (O-9/O-11, mock by
  * default) → JSON flatten (F-9/F-10) → the exact 14-column
  * OUTPUT_COLUMNS materialization (K-2, app.py:42-58) in input order
  * (T-4).
  *
  * A user of the reference switches by pointing this at their
  * (company, website, page-text) frame and swapping [[MockEnricher]]
  * for a real [[Enricher]]. Everything before the enrichment map is
  * narrow codegen'd column work over the scan; the map itself is
  * partition-parallel instead of the reference's sequential loop.
  */
object Pipelines {

  /** The reference's declared output schema, in order (app.py:42-58). */
  val OutputColumns: Seq[String] =
    Seq("Company Name", "Website", "Founded Info", "About Us") ++
      Enrichment.FlattenKeys ++ Seq("Email")

  /** @param docs frame with (doc_id, company, website, text) */
  def leadSight(docs: DataFrame, enricher: Enricher = MockEnricher): DataFrame = {
    import docs.sparkSession.implicits._
    val extracted = docs
      .withColumn("text_norm", Extraction.normalizeWs(col("text")))
      .withColumn("Founded Info", Extraction.extractFounded(col("text_norm")))
      .withColumn("About Us", Extraction.sentenceNear(col("text_norm"), "about us"))
      .withColumn("Email", Extraction.extractEmail(col("text_norm")))
    // the LLM context is the (truncated) page text, as in the reference
    // (app.py:223-227) — NOT the extracted About-Us sentence
    val enrichIn = extracted.select(col("doc_id"), col("company"),
        col("website"), substring(col("text_norm"), 1, 200).as("about"))
      .as[Enrichment.EnrichIn]
    val flat = Enrichment.flatten(
      Enrichment.enrichMap(enrichIn, enricher).toDF())
    val joined = extracted
      .select(col("doc_id"), col("company").as("Company Name"),
        col("website").as("Website"),
        col("Founded Info"), col("About Us"), col("Email"))
      .join(flat.drop("company"), "doc_id")
    joined.select(col("doc_id") +: OutputColumns.map(c => col(s"`$c`")): _*)
  }
}
