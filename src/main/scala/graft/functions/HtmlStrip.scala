package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → visible text, the step between a raw crawl payload and every
  * text-quality operator in this engine (CCNet/RefinedWeb pipelines strip
  * markup before language-ID, quality scoring, and dedup — markup inflates
  * n-gram overlap and poisons token statistics). One map-side codegen'd
  * regexp chain per document; zero shuffle.
  *
  * Drift control is the PiiPatterns device: [[Steps]] is the single ordered
  * source of truth, restricted to the Java-regex ∩ RE2 subset, folded into
  * the Spark Column and interpolated into the DuckDB renderer alike.
  *
  * Documented simplifications of a real parser: script/style/comment blocks
  * go first (so their content never survives as "text"), then any
  * remaining `<...>` run is treated as a tag; the five entities that
  * actually occur in crawl text get decoded in ONE pass with `&amp;` last —
  * double-encoded text (`&amp;lt;`) therefore decodes one level only,
  * which is the standard single-pass trade. A stray `<` in prose survives
  * unless a `>` follows it somewhere — acceptable for corpus text, honest
  * to note.
  */
object HtmlStrip {

  /** Ordered (pattern, replacement) chain — order is load-bearing. */
  val Steps: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[^>]+>" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&",
    "[ \\t\\n\\f\\r]+" -> " ")

  /** `<a ... href=` occurrences in the RAW markup — the outlink count a
    * crawl-graph builder wants before the tags are gone. `href` must sit
    * directly after attribute-separating whitespace and be followed by `=`,
    * so a quoted value like `name="no-href"` doesn't count.
    */
  val LinkPattern =
    "(?i)<a([ \\t\\n\\f\\r][^>]*)?[ \\t\\n\\f\\r]href[ \\t\\n\\f\\r]*="

  /** Visible text of an HTML payload (trimmed). */
  def stripHtml(html: Column): Column =
    trim(Steps.foldLeft(html) { case (acc, (p, r)) => regexp_replace(acc, p, r) })

  /** Outlink count over the raw markup. */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit(LinkPattern), lit(0))).cast("long")

  // ---- DuckDB renderers: same constants, explicit 'g', SQL-quoted ----

  private def q(s: String): String = s.replace("'", "''")

  def stripHtmlDuck(c: String): String =
    "trim(" + Steps.foldLeft(c) { case (acc, (p, r)) =>
      // dotall comes from the inline (?s) flags, identical in both engines;
      // only the global flag is a dialect difference
      s"regexp_replace($acc, '${q(p)}', '${q(r)}', 'g')"
    } + ")"

  def linkCountDuck(c: String): String =
    s"CAST(len(regexp_extract_all($c, '${q(LinkPattern)}')) AS BIGINT)"
}
