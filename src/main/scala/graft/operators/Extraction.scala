package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's scalar extraction surface, re-expressed as pure Catalyst
  * column expressions (whole-stage-codegen'd — no UDFs anywhere).
  *
  * Semantics pinned to the reference (SURVEY.md §2.5):
  *  - F-1 `extract_founded`  — /root/reference/app.py:65-75
  *  - F-2 `extract_email`    — /root/reference/app.py:78-81
  *  - F-3 `extract_sentence_near_keyword` — /root/reference/app.py:84-87
  *  - F-4 whitespace normalize — /root/reference/app.py:208
  *  - F-5 lower+trim         — /root/reference/app.py:155
  *  - F-12 truncate+ellipsis — /root/reference/index.html:686
  *  - A-3 completeness/status — /root/reference/index.html:651-653
  *  - K-2 ordered projection with null-fill — /root/reference/app.py:309
  *
  * All regexes are kept RE2-compatible (no backrefs/lookaround) so the same
  * pattern runs identically in Spark (java.util.regex) and the DuckDB oracle.
  */
object Extraction {

  /** F-4: collapse all whitespace runs to a single space. */
  def normalizeWs(c: Column): Column = regexp_replace(c, "\\s+", " ")

  /** F-5: lowercase + trim (anchor-text normalization). */
  def normToken(c: Column): Column = trim(lower(c))

  /** Spark regexp_extract returns "" on no-match; the reference returns
    * None. Map "" -> NULL (DuckDB regexp_extract also returns "" -> same
    * nullif in the oracle SQL). */
  private def firstMatch(c: Column, pattern: String): Column =
    nullif(regexp_extract(c, pattern, 0), lit(""))

  /** F-1: first match of three prioritized founded-year patterns; returns
    * the WHOLE match (group 0), e.g. "Founded in 1998". `coalesce`
    * short-circuits, preserving the reference's priority order. */
  val foundedPatterns: Seq[String] = Seq(
    "(?i)Founded\\s+(?:in\\s+)?\\d{4}",
    "(?i)Established\\s+(?:in\\s+)?\\d{4}",
    "(?i)Since\\s+\\d{4}")
  def extractFounded(c: Column): Column =
    coalesce(foundedPatterns.map(p => firstMatch(c, p)): _*)

  /** F-2: first email-shaped token (case-SENSITIVE, as in the reference). */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]+"
  def extractEmail(c: Column): Column = firstMatch(c, emailPattern)

  /** F-3: first dot-delimited "sentence" containing the keyword,
    * case-insensitive, stripped — the text segment between the '.'
    * immediately before and immediately after the first occurrence of
    * `kw`, exactly the match of the reference's `[^.]*kw[^.]*` regex
    * (leftmost start = segment start, greedy extent = segment end).
    *
    * Deliberately NOT that regex: `[^.]*kw[^.]*` is QUADRATIC in
    * java.util.regex on a long dot-free document that lacks the
    * keyword — every start position greedily consumes the rest of the
    * text before failing, and the r11 adversarial megadoc (2.3 M
    * chars, no '.') pinned executors in Pattern.CharPropertyGreedy for
    * >700 s. The locate+substr form below is ONE linear pass, stays in
    * whole-stage codegen, and is the shape that survives 100 TB of
    * unvetted crawl text. (The DuckDB oracle keeps the literal regex:
    * RE2 is a linear-time automaton, so the two sides stay both
    * correct AND fast, and the sweep pins their agreement.)
    *
    * Case-insensitivity is lower()'s Unicode folding — like RE2's
    * `(?i)`, unlike java.util.regex's ASCII-only default; the position
    * arithmetic assumes folding preserves code-point counts in the
    * text BEFORE the match (true except for oddities like İ→i̇, a
    * documented boundary a crawled English keyword never hits). */
  def sentenceNear(c: Column, kw: String): Column = {
    // Locale.ROOT: Spark's lower() folds locale-independently; the
    // default-locale fold would turn 'I' into dotless 'ı' under a
    // Turkish JVM locale and the keyword would silently never match.
    val kwl = kw.toLowerCase(java.util.Locale.ROOT)
    val lc = lower(c)
    val p = locate(kwl, lc)                    // 1-based; 0 = absent
    val pre = lc.substr(lit(1), p - 1)         // text strictly before kw
    val revDot = locate(".", reverse(pre))
    val q = when(revDot > 0, length(pre) - revDot + 1).otherwise(lit(0))
    // first '.' AFTER the keyword span — not at p: a keyword containing
    // literal dots (regex-quoted in the reference form) keeps them
    // INSIDE the match, only dots outside the span delimit the
    // sentence. kwLen in code points (locate/substr positions are
    // code-point-based). Three-arg locate: the Column-position
    // overload exists only in SQL.
    val kwLen = kwl.codePointCount(0, kwl.length)
    val rDot = call_function("locate", lit("."), lc, p + lit(kwLen))
    val r = when(rDot > 0, rDot).otherwise(length(lc) + 1)
    when(p === 0, lit(null).cast("string"))
      .otherwise(trim(c.substr(q + 1, r - q - 1)))
  }

  /** F-12: truncate with ellipsis at n chars. */
  def truncateEllipsis(c: Column, n: Int): Column =
    when(length(c) > n, concat(substring(c, 1, n), lit("…"))).otherwise(c)

  /** A-3: count of non-null fields. */
  def completeness(cols: Seq[Column]): Column =
    cols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)

  /** A-3: Full / Partial / Empty status over a completeness count. */
  def status(n: Column, full: Int): Column =
    when(n === full, "Full").when(n > 0, "Partial").otherwise("Empty")

  /** K-2: project exactly `cols` in order, null-filling absent ones.
    * Absent columns are cast to the type declared in `types` (so a typed
    * sink schema is preserved), defaulting to string when unknown. */
  def orderedProjection(df: DataFrame, cols: Seq[String],
      types: Map[String, org.apache.spark.sql.types.DataType] = Map.empty)
      : DataFrame = {
    val present = df.columns.toSet
    df.select(cols.map { c =>
      if (present(c)) col(c)
      else types.get(c) match {
        case Some(t) => lit(null).cast(t).as(c)
        case None    => lit(null).cast("string").as(c)
      }
    }: _*)
  }

  /** The flagship lead-extraction pipeline (reference §3.1 inner loop minus
    * external I/O): documents.text plays the crawled-page corpus.
    * Narrow, fully codegen'd map — scales linearly with input splits;
    * column pruning means only (doc_id, text) is read from parquet.
    * Deliberately UNordered: global sorts belong at bounded sinks only
    * (SURVEY T-4); the oracle-facing query wrapper adds orderBy(doc_id). */
  def leadExtract(docs: DataFrame): DataFrame = {
    val t = normalizeWs(col("text"))
    // All three extractions in ONE project: runtime subexpression
    // elimination then evaluates the shared whitespace-normalize pass
    // once per row. A withColumn chain splits them into separate
    // projects that CollapseProject declines to merge (expensive exprs),
    // leaving the normalize regex re-run per extraction — measured ~2×
    // on the text-heavy path.
    val extracted = docs.select(
      col("doc_id"),
      extractFounded(t).as("founded_info"),
      sentenceNear(t, "about us").as("about_us"),
      extractEmail(t).as("email"))
    // Second project sees only cheap attribute refs; the regex aliases
    // are referenced 3× (output + completeness + status), which is
    // exactly the multi-use case CollapseProject's guard keeps
    // un-inlined, so nothing below recomputes an extraction.
    val comp = completeness(Seq(col("founded_info"), col("about_us"), col("email")))
    extracted.select(col("doc_id"), col("founded_info"), col("about_us"),
      col("email"), comp.as("completeness"), status(comp, 3).as("status"))
  }

  /** A-1/A-2: global conditional non-null counts over the extraction
    * result (the reference UI's stat tiles, index.html:669-675). */
  def extractStats(docs: DataFrame): DataFrame = {
    val lead = leadExtract(docs)
    lead.agg(
      count(lit(1)).as("n_docs"),
      count(col("founded_info")).as("n_founded"),
      count(col("about_us")).as("n_about"),
      count(col("email")).as("n_email"),
      sum(when(col("status") === "Empty", 1).otherwise(0)).as("n_empty"))
  }
}
