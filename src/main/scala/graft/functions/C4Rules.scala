package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §2.2 — the rule set that produced the C4 corpus
  * from Common Crawl):
  *
  *   line level (applied first):
  *     - keep only lines ending in a terminal punctuation mark (. ! ? "),
  *     - keep only lines with ≥ `minLineWords` (paper: 5) words,
  *     - drop any line containing the word "javascript";
  *   page level (over the raw page):
  *     - drop pages whose CLEANED text has fewer than `minSentences`
  *       (paper: 3) sentences — sentence ≈ terminal-punct occurrence,
  *     - drop pages containing "lorem ipsum",
  *     - drop pages containing a curly brace.
  *
  * (The paper's remaining steps exist elsewhere in the engine: the
  * three-sentence-span dedup is [[SpanDedup]], the bad-words list is a
  * blocklist filter, langdetect is [[TextFunctions.langId]].)
  *
  * Pure Catalyst builtins, zero shuffle: one let-bound line split per
  * document (the `transform(array(...))` device), nested HOF filters for
  * the per-line word counts. Exactly replayable in DuckDB via
  * `list_filter` + `array_to_string`, so the whole cleaner is
  * oracle-checkable.
  */
object C4Rules {

  private val Ws = "[ \\t\\n\\f\\r]"
  // terminal punctuation incl. closing double quote (the paper's rule)
  private val TerminalRe = "[.!?\"]$"
  private val JavascriptRe = "\\bjavascript\\b"
  private val SentenceRe = "[.!?]"

  /** The kept-lines array of one document (line rules only). */
  private def keptLines(text: Column, minLineWords: Int): Column =
    filter(split(text, "\n"), l =>
      trim(l).rlike(TerminalRe) &&
        size(filter(split(trim(l), s"$Ws+"), w => length(w) > 0)) >= minLineWords &&
        !lower(l).rlike(JavascriptRe))

  /** Cleaned page text: surviving lines re-joined with newlines (possibly
    * empty). Map-side, one pass.
    */
  def cleanText(text: Column, minLineWords: Int = 5): Column =
    array_join(keptLines(text, minLineWords), "\n")

  /** Page keep-predicate over (raw text, cleaned text). The sentence count
    * runs on the CLEANED text — the paper discards pages too short after
    * line filtering; the content bans run on the RAW page (boilerplate in a
    * dropped line still damns the page).
    */
  def keepPage(raw: Column, cleaned: Column, minSentences: Int = 3): Column =
    regexp_count(cleaned, lit(SentenceRe)) >= minSentences &&
      !contains(lower(raw), lit("lorem ipsum")) &&
      !contains(raw, lit("{"))

  /** Full C4 clean of a corpus: survivors only, with `text_clean` replacing
    * the page body. One projection + one filter — no shuffle, text columns
    * pruned to the one column read.
    */
  def clean(docs: DataFrame, textCol: String = "text",
            minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val cleaned = docs.withColumn("text_clean", cleanText(col(textCol), minLineWords))
    cleaned.filter(keepPage(col(textCol), col("text_clean"), minSentences))
  }
}
