package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F-13 presentation scalar functions (/root/reference/index.html:
  * 678-682 esc/slugify, 492-496 formatSize) as pure codegen'd column
  * expressions — originally scoped out as UI-side, but they are plain
  * string functions and belong in the engine so a report/export query
  * can produce render-ready columns without a post-processing hop.
  */
object Present {

  /** esc: &, <, >, " — ampersand FIRST so produced entities aren't
    * re-escaped (the reference's replace order); null → "". */
  def htmlEscape(c: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;", "\"" -> "&quot;")
      .foldLeft(coalesce(c, lit(""))) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
      }

  /** slugify: every non-alphanumeric CHARACTER becomes one dash (the
    * reference's per-char /g replace — runs are not collapsed), then
    * lowercase. */
  def slugify(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9]", "-"))

  /** formatSize, decomposed into (value, unit) columns instead of one
    * formatted string: double-to-string rendering is locale/engine
    * dependent, while the rounded DOUBLE itself is exact cross-engine —
    * byte counts divided by powers of two have exact binary
    * representations, so the 1-decimal rounding can never sit on an
    * ambiguous half. */
  def sizeUnit(bytes: Column): Column =
    when(bytes < 1024L, "B")
      .when(bytes < 1024L * 1024, "KB")
      .otherwise("MB")

  def sizeValue(bytes: Column): Column =
    when(bytes < 1024L, bytes.cast("double"))
      .when(bytes < 1024L * 1024, round(bytes / lit(1024.0), 1))
      .otherwise(round(bytes / lit(1024.0 * 1024), 1))
}
