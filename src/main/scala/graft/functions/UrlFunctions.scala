package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host analytics — the provenance half of a web
  * corpus pipeline (RefinedWeb/CCNet keep one document per canonical URL,
  * gate whole hosts by blocklist, and weight mixtures by host statistics;
  * see /root/reference README for the source-provenance framing its CDC
  * streams carry). Everything is a map-side codegen'd regexp/concat chain —
  * zero shuffle until the caller aggregates.
  *
  * Drift control is the PiiPatterns device: the regex constants below are
  * restricted to the Java-regex ∩ RE2 subset and are interpolated verbatim
  * into BOTH the Spark Columns and the DuckDB oracle renderers
  * ([[normalizeUrlDuck]] etc.) — the only dialect differences are the
  * function shells (DuckDB `regexp_replace` needs an explicit 'g' flag
  * where Spark is always-global; `len` vs `size`), each pinned by the
  * oracle gate.
  *
  * Canonicalization rule (documented simplifications): lowercase
  * scheme://host, strip a `:80`/`:443` default port, collapse duplicate
  * path slashes, strip one trailing slash, drop query + fragment entirely
  * (tracking-vs-content query params are reported as a separate signal, not
  * guessed at). Authority userinfo (`user:pass@`) is out of scope — corpus
  * crawl URLs don't carry it.
  */
object UrlFunctions {

  /** scheme://host[:port] — the case-insensitive head up to path/query/frag. */
  val SchemeHostPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** capture group 1 = the path part (may be empty). */
  val PathPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** capture group 1 = the bare host (strips scheme, port, path). */
  val HostPattern = "://([^/:?#]*)"

  /** ad-tech / tracking query parameters a crawler strips before dedup. */
  val TrackingParamPattern = "[?&](utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)="

  private val DefaultPortPattern = ":(80|443)$"
  private val DupSlashPattern = "/{2,}"
  private val TrailingSlashPattern = "/$"
  private val WwwPattern = "^www\\."
  private val TldPattern = "\\.([A-Za-z0-9-]+)$"

  /** Normalized path: duplicate slashes collapsed, trailing slash stripped. */
  private def normPath(u: Column): Column =
    regexp_replace(
      regexp_replace(regexp_extract(u, PathPattern, 1), DupSlashPattern, "/"),
      TrailingSlashPattern, "")

  /** Canonical URL: lowercased scheme://host minus default port, plus the
    * normalized path. Query and fragment are dropped (see scaladoc above).
    */
  def normalizeUrl(u: Column): Column =
    concat(
      regexp_replace(lower(regexp_extract(u, SchemeHostPattern, 0)),
        DefaultPortPattern, ""),
      normPath(u))

  /** Registered host: lowercased, `www.` prefix stripped. */
  def urlHost(u: Column): Column =
    regexp_replace(lower(regexp_extract(u, HostPattern, 1)), WwwPattern, "")

  /** Last dotted label of a host ("com", "org", …); empty for dotless hosts. */
  def urlTld(host: Column): Column = regexp_extract(host, TldPattern, 1)

  /** Path depth = number of '/' in the normalized path (0 for root). */
  def pathDepth(u: Column): Column =
    size(regexp_extract_all(normPath(u), lit("/"), lit(0))).cast("long")

  /** How many tracking query params the RAW url carries. */
  def trackingParamCount(u: Column): Column =
    size(regexp_extract_all(u, lit(TrackingParamPattern), lit(0))).cast("long")

  // ---- DuckDB renderers: same constants, explicit 'g' where global ----

  private def duckNormPath(c: String): String =
    s"regexp_replace(regexp_replace(regexp_extract($c, '$PathPattern', 1), " +
      s"'$DupSlashPattern', '/', 'g'), '$TrailingSlashPattern', '')"

  def normalizeUrlDuck(c: String): String =
    s"(regexp_replace(lower(regexp_extract($c, '$SchemeHostPattern', 0)), " +
      s"'$DefaultPortPattern', '') || ${duckNormPath(c)})"

  def urlHostDuck(c: String): String =
    s"regexp_replace(lower(regexp_extract($c, '$HostPattern', 1)), '$WwwPattern', '')"

  def urlTldDuck(host: String): String =
    s"regexp_extract($host, '$TldPattern', 1)"

  def pathDepthDuck(c: String): String =
    s"CAST(len(regexp_extract_all(${duckNormPath(c)}, '/')) AS BIGINT)"

  def trackingParamCountDuck(c: String): String =
    s"CAST(len(regexp_extract_all($c, '$TrackingParamPattern')) AS BIGINT)"
}

/** Unicode-script profiling — the multilingual routing signal next to
  * [[TextFunctions.langId]]: per-document counts of characters in the major
  * script ranges, for corpus audits ("how much CJK did this crawl pull
  * in?") and mixture routing. Patterns are CODEPOINT-RANGE classes written
  * with `\x{...}` escapes — the notation Java regex and RE2 share (script
  * NAMES don't port: Java wants `\p{IsLatin}`, RE2 wants `\p{Latin}`) — so
  * the same constants drive the Spark Columns and the DuckDB oracle.
  * All map-side `regexp_extract_all` counts over codegen'd builtins.
  */
object ScriptProfile {

  /** (name, range-class) — ranges cover the scripts' core blocks; combining
    * marks / supplementary planes are out of scope for a routing signal.
    */
  val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]")

  import org.apache.spark.sql.functions.{lit, regexp_extract_all, size}

  /** Count of `script` characters in the text (long). */
  def count(text: Column, script: String): Column = {
    val p = Scripts.toMap.apply(script)
    size(regexp_extract_all(text, lit(p), lit(0))).cast("long")
  }

  def countDuck(c: String, script: String): String =
    s"CAST(len(regexp_extract_all($c, '${Scripts.toMap.apply(script)}')) AS BIGINT)"
}
