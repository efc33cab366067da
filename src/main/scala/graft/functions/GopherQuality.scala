package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher / MassiveText QUALITY heuristics (Rae et al. 2021, table A1 —
  * the document-shape half; the repetition half lives in
  * [[TextFunctions.repetitionStats]] / [[CorpusPipeline.repetitionGate]]):
  *
  *   - word count within [50, 100k],
  *   - mean word length within [3, 10] characters,
  *   - symbol-to-word ratio (# / ellipsis) ≤ 0.1,
  *   - ≤ 90% of lines start with a bullet,
  *   - ≤ 30% of lines end with an ellipsis,
  *   - ≥ 80% of words contain at least one alphabetic character,
  *   - ≥ 2 distinct "stop words" of {the, be, to, of, and, that, have, with}.
  *
  * Everything is pure Catalyst builtins — one let-bound whitespace split and
  * one let-bound line split per document (the `transform(array(...))` device
  * from [[TextFunctions.charShingles]]: referencing `split` inside each
  * signal would re-tokenize per signal), zero shuffle, full column pruning.
  * Every signal is exactly replayable in DuckDB (list_filter /
  * regexp_extract_all over the same pinned regex subset), so the gate is
  * oracle-checkable end to end.
  */
object GopherQuality {

  /** Rae et al. 2021 table A1 caps; defaults are the paper's values. */
  final case class Thresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.90,
      maxEllipsisLineFrac: Double = 0.30,
      minAlphaWordFrac: Double = 0.80,
      minStopwordHits: Int = 2)

  /** The paper's fluency stop-word list, alphabetical (order is part of the
    * oracle contract — the hit count is order-independent but the pinned
    * list itself must match the SQL renderer verbatim).
    */
  val StopWords: Seq[String] =
    Seq("and", "be", "have", "of", "that", "the", "to", "with")

  // the engine-wide pinned whitespace class (RE2 \s — see TextFunctions)
  private val Ws = "[ \\t\\n\\f\\r]"
  private val BulletRe = "^[-*•‣▪]"
  private val EllipsisRe = "(\\.\\.\\.|…)$"
  private val SymbolRe = "#|\\.\\.\\.|…"

  /** Let-bind the word array and the non-blank line array, then build one
    * result column from the bound references — each split runs once per
    * document however many signals (or gate conjuncts) read it. This is the
    * device that keeps [[gate]] a SINGLE tokenize pass in a filter: filter
    * codegen does no cross-conjunct subexpression elimination (the
    * [[CorpusPipeline.repetitionGateOn]] caveat), so the conjunction has to
    * be assembled INSIDE the binding.
    */
  private def bound(text: Column)(f: (Column, Column) => Column): Column = {
    val words = filter(split(text, s"$Ws+"), w => length(w) > 0)
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    element_at(transform(array(words), ws =>
      element_at(transform(array(lines), ls => f(ws, ls)), 1)), 1)
  }

  private def signals(text: Column, ws: Column, ls: Column) = {
    val nw = size(ws)
    val nl = size(ls)
    val nwD = nw.cast("double")
    val charSum = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val bulletLines = size(filter(ls, l => ltrim(l).rlike(BulletRe)))
    val ellipsisLines = size(filter(ls, l => rtrim(l).rlike(EllipsisRe)))
    val stopHits = size(filter(
      array(StopWords.map(lit): _*),
      s => exists(ws, w => lower(w) === s)))
    val symbols = regexp_count(text, lit(SymbolRe))
    (nw, nl,
      when(nw === 0, lit(0.0)).otherwise(charSum.cast("double") / nwD),
      when(nw === 0, lit(0.0)).otherwise(symbols.cast("double") / nwD),
      when(nl === 0, lit(0.0)).otherwise(bulletLines.cast("double") / nl),
      when(nl === 0, lit(0.0)).otherwise(ellipsisLines.cast("double") / nl),
      when(nw === 0, lit(0.0)).otherwise(alphaWords.cast("double") / nwD),
      stopHits)
  }

  /** All eight signals in one struct:
    * (n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
    * ellipsis_line_frac, alpha_word_frac, stopword_hits, n_lines).
    * Fractions are 0.0 on empty denominators. Doubles are raw — round at
    * the query edge.
    */
  def stats(text: Column): Column = bound(text) { (ws, ls) =>
    val (nw, nl, meanLen, symRatio, bulletFrac, ellipsisFrac, alphaFrac, stopHits) =
      signals(text, ws, ls)
    struct(
      nw.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_word_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.cast("long").as("stopword_hits"),
      nl.cast("long").as("n_lines"))
  }

  /** One-column keep-predicate — the full conjunction assembled inside the
    * let-binding, so a `filter(gate(text))` stays ONE tokenize pass per
    * document. Stateless: identical semantics under batch and Structured
    * Streaming.
    */
  def gate(text: Column, th: Thresholds = Thresholds()): Column = bound(text) { (ws, ls) =>
    val (nw, _, meanLen, symRatio, bulletFrac, ellipsisFrac, alphaFrac, stopHits) =
      signals(text, ws, ls)
    nw.between(th.minWords, th.maxWords) &&
      meanLen.between(th.minMeanWordLen, th.maxMeanWordLen) &&
      symRatio <= th.maxSymbolWordRatio &&
      bulletFrac <= th.maxBulletLineFrac &&
      ellipsisFrac <= th.maxEllipsisLineFrac &&
      alphaFrac >= th.minAlphaWordFrac &&
      stopHits >= th.minStopwordHits
  }

  /** Keep-predicate over an already-computed [[stats]] struct reference —
    * for queries that genuinely project the struct fields next to the gate
    * decision (same multi-evaluation caveat in bare filters as
    * [[CorpusPipeline.repetitionGateOn]]).
    */
  def gateOn(st: Column, th: Thresholds = Thresholds()): Column =
    st.getField("n_words").between(th.minWords, th.maxWords) &&
      st.getField("mean_word_len").between(th.minMeanWordLen, th.maxMeanWordLen) &&
      st.getField("symbol_word_ratio") <= th.maxSymbolWordRatio &&
      st.getField("bullet_line_frac") <= th.maxBulletLineFrac &&
      st.getField("ellipsis_line_frac") <= th.maxEllipsisLineFrac &&
      st.getField("alpha_word_frac") >= th.minAlphaWordFrac &&
      st.getField("stopword_hits") >= th.minStopwordHits
}
