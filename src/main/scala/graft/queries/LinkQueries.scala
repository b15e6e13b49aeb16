package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{LinkSelection, UrlOps}

/** Link-selection pipeline + URL functions (F-6/F-7/F-8, P-2..P-4,
  * T-1..T-3) over a deterministic candidate frame derived from
  * `documents` — the testdata has no real URLs, so we synthesize them
  * reproducibly (pure column expressions, mirrored in the oracle SQL).
  *
  * The registered query scores with word-soup-adapted keywords so the
  * score distribution is non-trivial on this data; the reference's exact
  * keyword list and semantics are pinned in LinkSelectionSpec.
  */
object LinkQueries extends QueryModule {

  /** Keywords that actually occur in the synthetic corpus. */
  val SoupKeywords: Seq[String] = Seq(
    "table", "join", "query", "group", "customer",
    "row", "filter", "scan", "data", "value")

  /** Candidate link frame: one candidate per document. ~1/17 have a NULL
    * href (exercises P-2), ~1/5 are off-domain (exercises P-3). */
  def candidates(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("source").as("company"),
      concat(lit("https://www."), col("source"), lit(".example.com")).as("website"),
      when(col("doc_id") % 17 === 0, lit(null).cast("string"))
        .when(col("doc_id") % 5 === 0, lit("https://external.example.org/offsite"))
        .otherwise(concat(lit("/"), col("lang"), lit("/p"), col("doc_id")))
        .as("href"),
      substring(col("text"), 1, 60).as("anchor_text"))

  private val candidatesSql =
    """SELECT source AS company,
      |       'https://www.' || source || '.example.com' AS website,
      |       CASE WHEN doc_id % 17 = 0 THEN NULL
      |            WHEN doc_id % 5 = 0 THEN 'https://external.example.org/offsite'
      |            ELSE '/' || lang || '/p' || doc_id END AS href,
      |       substr(text, 1, 60) AS anchor_text
      |FROM documents""".stripMargin

  /** F-8 as SQL, kept in sync with LinkSelection.keywordScore. */
  private def scoreSql(anchor: String, url: String, kws: Seq[String]): String =
    kws.map { k =>
      s"(CASE WHEN contains($anchor, '$k') THEN 2 ELSE 0 END + " +
        s"CASE WHEN contains(lower($url), '$k') THEN 3 ELSE 0 END)"
    }.mkString(" + ")

  def defs: Map[String, Q] = Map(
    // Full pipeline: null-filter → urljoin → same-domain → score → >0 →
    // dedup → per-company top-3.
    "link_topk" -> ((s, d) =>
      LinkSelection.selectLinks(candidates(s, d), k = 3, keywords = SoupKeywords)
        .orderBy("company", "rk")),

    // F-7: host extraction via parse_url (no UDF).
    "url_host" -> ((s, d) =>
      candidates(s, d).select(col("company"), col("website"),
          UrlOps.host(col("website")).as("host"))
        .distinct()
        .orderBy("company")),

    // PageRank over the document link graph (X-52): the iterative
    // graph op next to connected components, 3 unrolled power
    // iterations at damping 0.85. The graph is synthesized
    // deterministically — each doc links to 3 hash-derived targets,
    // EXCEPT every 7th doc, which emits nothing: a SINK. Sinks are
    // what make the dangling-mass term real — without it, their rank
    // would simply vanish each hop and Σrank would decay ~12%/round
    // on this graph. The operator shape is the production one: the
    // edge list is materialized once and pre-partitioned on src
    // exactly like the CC loop (it is consumed by every iteration's
    // join); each round materializes its rank frame (consumed twice —
    // contributions + dangling sum — and real deployments run tens of
    // rounds, so lineage must stay flat); contributions aggregate per
    // dst; the dangling mass is ONE tiny aggregate broadcast to all
    // nodes; no-inbound nodes pick up base + dangling share via left
    // join. All arithmetic is integer fixed-point (rank·1e12,
    // truncating div on non-negative operands) so three rounds of
    // mass-splitting reproduce bit-identically in both engines.
    "link_pagerank" -> ((s, d) => {
      val Scale = 1000000000000L
      val docs = Tables.documents(s, d).select("doc_id")
      val stats = docs.agg(count(lit(1)).as("n"))
      val edges = graft.operators.Dedup.materialize(
        docs.crossJoin(broadcast(stats))
          .filter(col("doc_id") % 7 =!= 0) // 1-in-7 docs are sinks
          .select(col("doc_id").as("src"),
            explode(array((1 to 3).map(j =>
              (col("doc_id") * 31 + j * 97) % col("n")): _*)).as("dst"))
          .repartition(col("src")))
      def iterate(rIn: DataFrame): DataFrame = {
        val r = graft.operators.Dedup.materialize(rIn)
        val contrib = edges.join(r, edges("src") === r("doc_id"))
          .select(col("dst"), expr("r div 3").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("dsum"))
        // the rank mass sitting on sink nodes this round, spread
        // evenly over all n nodes (the standard dangling-node term)
        val dangling = r.filter(col("doc_id") % 7 === 0)
          .agg(coalesce(sum(col("r")), lit(0L)).as("dmass"))
        docs.crossJoin(broadcast(stats)).crossJoin(broadcast(dangling))
          .join(contrib, docs("doc_id") === contrib("dst"), "left_outer")
          .select(col("doc_id"),
            expr(s"(($Scale div n) * 15) div 100 " +
              "+ (coalesce(dsum, 0L) + dmass div n) * 85 div 100").as("r"))
      }
      val r0 = docs.crossJoin(broadcast(stats))
        .select(col("doc_id"), expr(s"$Scale div n").as("r"))
      val r3 = iterate(iterate(iterate(r0)))
      r3.select(col("doc_id"), col("r").as("rank_fx"),
          (col("r").cast("double") / Scale).as("rank"))
        .orderBy("doc_id")
    }),

    // S-4: link scan as row explosion — each document yields its <a>
    // elements (href + anchor) as rows, the operator feeding P-2..P-4
    // (/root/reference/app.py:147-155). Links are synthesized
    // deterministically since the corpus has no markup.
    "link_scan" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          posexplode(sequence(lit(0), lit(2))).as(Seq("link_idx", "i")))
        .select(col("doc_id"), col("link_idx"),
          concat(lit("/"), col("lang"), lit("/p"), col("doc_id"),
            lit("/"), col("link_idx")).as("href"))
        .orderBy("doc_id", "link_idx")),
  )

  def oracle: Map[String, String] = Map(
    "link_pagerank" -> {
      def iterSql(prev: String, cn: String, dn: String, rn: String) =
        s"""$cn AS (SELECT e.dst, CAST(sum(r.r // 3) AS BIGINT) AS dsum
           |       FROM edges e JOIN $prev r ON e.src = r.doc_id GROUP BY e.dst),
           |$dn AS (SELECT COALESCE(CAST(sum(r.r) AS BIGINT), 0) AS dmass
           |       FROM $prev r WHERE r.doc_id % 7 = 0),
           |$rn AS (SELECT d.doc_id,
           |         CAST(((1000000000000 // st.n) * 15) // 100
           |              + (COALESCE($cn.dsum, 0) + $dn.dmass // st.n) * 85 // 100 AS BIGINT) AS r
           |       FROM docs d CROSS JOIN st CROSS JOIN $dn
           |       LEFT JOIN $cn ON d.doc_id = $cn.dst)""".stripMargin
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |st AS (SELECT count(*) AS n FROM docs),
         |edges AS (SELECT doc_id AS src, (doc_id * 31 + j * 97) % n AS dst
         |          FROM docs CROSS JOIN st, range(1, 4) t(j)
         |          WHERE doc_id % 7 <> 0),
         |r0 AS (SELECT doc_id, CAST(1000000000000 // n AS BIGINT) AS r
         |       FROM docs CROSS JOIN st),
         |${iterSql("r0", "c1", "d1", "r1")},
         |${iterSql("r1", "c2", "d2", "r2")},
         |${iterSql("r2", "c3", "d3", "r3")}
         |SELECT doc_id, r AS rank_fx, CAST(r AS DOUBLE) / 1000000000000 AS rank
         |FROM r3 ORDER BY doc_id""".stripMargin
    },

    "link_topk" ->
      s"""WITH cand AS ($candidatesSql),
         |resolved AS (
         |  SELECT company,
         |         CASE WHEN href LIKE 'http%' THEN href ELSE website || href END AS full_url,
         |         anchor_text, website
         |  FROM cand WHERE href IS NOT NULL),
         |same_domain AS (
         |  SELECT * FROM resolved
         |  WHERE contains(full_url, regexp_extract(website, '^https?://([^/:]+)', 1))),
         |scored AS (
         |  SELECT company, full_url,
         |         ${scoreSql("trim(lower(anchor_text))", "full_url", SoupKeywords)} AS score
         |  FROM same_domain),
         |deduped AS (SELECT company, full_url, max(score) AS score
         |            FROM scored WHERE score > 0 GROUP BY company, full_url),
         |ranked AS (
         |  SELECT company, full_url, score,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY company
         |              ORDER BY score DESC, full_url) AS INTEGER) AS rk
         |  FROM deduped)
         |SELECT company, full_url, score, rk FROM ranked
         |WHERE rk <= 3 ORDER BY company, rk""".stripMargin,

    "url_host" ->
      s"""WITH cand AS ($candidatesSql)
         |SELECT DISTINCT company, website,
         |       regexp_extract(website, '^https?://([^/:]+)', 1) AS host
         |FROM cand ORDER BY company""".stripMargin,

    "link_scan" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS link_idx,
        |       '/' || lang || '/p' || doc_id || '/' || i AS href
        |FROM documents, range(3) t(i)
        |ORDER BY doc_id, link_idx""".stripMargin,
  )
}
