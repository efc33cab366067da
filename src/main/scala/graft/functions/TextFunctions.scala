package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting, shingling.
  *
  * Everything here composes Catalyst built-ins only — no Scala UDFs — so the
  * expressions stay codegen-compiled and a 100 TB document scan runs these at
  * parquet-read speed with full column pruning (only `text` is read).
  */
object TextFunctions {

  // Whitespace throughout this object is the PINNED class [ \t\n\f\r] —
  // RE2's \s, replayed exactly by DuckDB oracles; Java \s additionally
  // swallows VT 0x0B (the md5-family pin, Md5Family.scala). WsChars is the
  // single source of truth; negated classes below interpolate it so the
  // pin cannot drift between the positive and negated spellings.
  private val WsChars = " \\t\\n\\f\\r"
  private val Ws = s"[$WsChars]"

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), s"$Ws+")))

  /** BPE-ish token count: alphabetic runs, single digits, and isolated
    * non-alphanumeric symbols — the GPT-2 pre-tokenizer shape, countable with
    * one regexp scan.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(s"[A-Za-z]+|[0-9]|[^A-Za-z0-9$WsChars]"))

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise(regexp_count(text, lit(s"[^A-Za-z0-9$WsChars]")).cast("double") / n)
  }

  /** Ratio of digit characters. */
  def digitRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise(regexp_count(text, lit("[0-9]")).cast("double") / n)
  }

  /** Mean whitespace-token length — long-token soup is a spam signal. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokenCount(text)
    when(toks === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, s"$Ws+", "")).cast("double") / toks)
  }

  /** All scalar stats in one fused pass ([[expressions.TextStatsExpr]]):
    * struct(n_tokens, n_bpe, n_punct, n_digit, n_nonws, n_chars). Read
    * multiple fields off one reference — subexpression elimination keeps it
    * a single text walk per row, versus one regexp scan per stat in the
    * composed forms above (kept for API compatibility and as the parity
    * oracle for this expression).
    */
  def textStats(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.TextStatsExpr(ColumnBridge.expression(text)))
  }

  /** Gopher-style repetition signals in one fused pass
    * ([[expressions.RepetitionStatsExpr]]): struct(word_cnt, dup_word_frac,
    * top2_frac, top3_frac, top4_frac, dup5_frac, line_cnt, dup_line_frac,
    * dup_line_char_frac). Map-side per-document — the standard
    * repetitive-document filters of corpus curation without an explode or
    * a shuffle.
    */
  def repetitionStats(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.RepetitionStatsExpr(ColumnBridge.expression(text)))
  }

  /** Misra–Gries frequent-items aggregate ([[expressions.MisraGriesAgg]]):
    * array<struct<token, est_count>> of at most `capacity` entries, built
    * with bounded memory map-side and merged pairwise — the full token
    * histogram is never shuffled. Estimates are within N/capacity of the
    * truth and every token with frequency > N/capacity is present; recount
    * the candidates for exact heavy hitters.
    */
  def misraGries(token: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      expressions.MisraGriesAgg(ColumnBridge.expression(token), capacity)
        .toAggregateExpression())
  }

  // single authoritative lexicon copy lives in LangIdExpr (the fused
  // expression) so the two language-ID forms can never drift
  private val stopwords: Map[String, Seq[String]] =
    expressions.LangIdExpr.lexicons.map { case (l, ws) => l -> ws.toSeq.sorted }.toMap

  private def wordPattern(words: Seq[String]): String =
    words.mkString("\\b(", "|", ")\\b")

  /** Count of stopword hits for one language (case-insensitive, word-bounded). */
  def stopwordHits(text: Column, lang: String): Column =
    regexp_count(lower(text), lit(wordPattern(stopwords(lang))))

  /** Fraction of tokens that are English stopwords — the classic fluency
    * signal in quality-filter cascades.
    */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val toks = tokenCount(text)
    when(toks === 0, lit(0.0))
      .otherwise(stopwordHits(text, lang).cast("double") / toks)
  }

  /** N-gram-heuristic language ID: the language whose stopword lexicon hits
    * most (equal hits resolve to the greatest language code); "und"
    * (undetermined) when nothing hits. ONE fused tokenize-and-count pass
    * ([[expressions.LangIdExpr]]) instead of |languages| regexp scans.
    */
  def langId(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.LangIdExpr(ColumnBridge.expression(text)))
  }

  /** Composed-builtins language ID — the parity oracle for [[langId]]. */
  private[graft] def langIdComposed(text: Column): Column = {
    val hits = stopwords.keys.toSeq.sorted.map(l => struct(
      stopwordHits(text, l).as("hits"), lit(l).as("lang")))
    val best = array_max(array(hits: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * token-shape sanity, the usual cheap pre-filter before model-based
    * scoring. Deterministic and oracle-expressible.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(20, 20000), lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.0))
    val tokOk = when(meanTokenLength(text).between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    round((lenOk + punctOk + tokOk) / 3.0, 4)
  }

  /** Repair UTF-8-as-Latin-1 mojibake ("Ã©" → "é"), applied only when the
    * inverse transform provably applies; genuine Latin-1 text and ASCII
    * pass through untouched. Spec-pinned (byte-level charset round-trip has
    * no SQL replay); see [[expressions.FixMojibakeExpr]].
    */
  def fixMojibake(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.FixMojibakeExpr(ColumnBridge.expression(text)))
  }

  /** Deflate compression ratio — the Gopher-style templated/repetitive-text
    * signal (prose ≈ 0.35–0.6, boilerplate → 0.1, random blobs → 1).
    * Spec-pinned (no SQL zlib exists for an oracle); see
    * [[expressions.CompressionRatioExpr]].
    */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.CompressionRatioExpr(ColumnBridge.expression(text)))
  }

  /** Unicode NFC normalization (UAX #15) — canonicalize combining-mark
    * sequences BEFORE fingerprinting/dedup/tokenization so "é" and
    * "e"+U+0301 hash identically; DuckDB's `nfc_normalize` replays it for
    * the oracle. Fast path skips already-normalized text.
    */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.NfcNormalizeExpr(ColumnBridge.expression(text)))
  }

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * non-alphanumerics to spaces, collapse runs, trim.
    */
  def normalized(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.NormalizedTextExpr(ColumnBridge.expression(text)))
  }

  /** Composed-builtins normalization — the parity oracle for [[normalized]]. */
  private[graft] def normalizedComposed(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** Content fingerprint = MD5 of the normalized text: whitespace/punct/case
    * variations collapse to one 128-bit key. Group on this, not on raw text —
    * 16-byte shuffle keys instead of document bodies.
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Let-bind an expensive column: the returned reference evaluates `c`
    * exactly once per row however many times a projection reads it.
    * HOF-built kernels (filter/aggregate/exists compositions like
    * [[GopherQuality.stats]]) are interpreted CodegenFallback trees that
    * whole-stage codegen's subexpression elimination does NOT share, so N
    * `getField` reads = N full kernel runs without this (measured 2.2× on
    * the gopher-gate battery at sf0.1). `transform`'s lambda variable is
    * the evaluation barrier — no optimizer rule inlines through it (the
    * [[charShingles]] device, packaged).
    */
  def letBound(c: Column): Column =
    element_at(transform(array(c), v => v), 1)

  /** Character k-shingles of the normalized text, as an array column, for
    * MinHash. Built from `sequence` + `transform` (native higher-order
    * functions, no UDF).
    *
    * The normalized string is LET-BOUND through a one-element outer
    * `transform` so the lambda sees it as a variable: referencing
    * `normalized(text)` directly inside the inner lambda would re-run the
    * two-regex normalization once per shingle (measured: 30× slower on a
    * 300-char document).
    */
  def charShingles(text: Column, k: Int): Column =
    flatten(transform(array(normalized(text)), t =>
      when(length(t) < k, array(t)).otherwise(
        array_distinct(transform(
          sequence(lit(1), length(t) - (k - 1)),
          i => t.substr(i, lit(k)))))))

  /** Distinct hashes of the normalized k-shingles as `array<long>` — the
    * fused single-pass expression ([[expressions.ShingleHashesExpr]]). The
    * MinHash fast path: shingle strings are never materialized.
    */
  def shingleHashes(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.ShingleHashesExpr(ColumnBridge.expression(text), k))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): rolling k-gram
    * hashes of the normalized text, thinned to each w-window's minimum
    * (rightmost ties, consecutive repeats dropped) — `array<long>`, density
    * ~2/(w+1) of the shingle count. Any shared substring of length
    * >= w + k - 1 between two documents yields at least one shared
    * fingerprint, so grouping/joining on the exploded fingerprints finds
    * partial-overlap near-dups that whole-document hashing misses.
    * One fused per-row pass ([[expressions.WinnowExpr]]); no shuffle.
    */
  def winnowedFingerprints(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.WinnowExpr(
      expressions.ShingleHashesExpr(ColumnBridge.expression(text), k, distinct = false), w))
  }

  /** Distinct hashes of the word n-grams as `array<long>` — fused
    * single-pass expression ([[expressions.WordNgramHashesExpr]]).
    */
  def wordNgramHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.WordNgramHashesExpr(ColumnBridge.expression(text), n))
  }

  /** Word n-grams of the normalized text (for n-gram Jaccard dedup).
    * Token array let-bound like [[charShingles]].
    */
  def wordNgrams(text: Column, n: Int): Column =
    flatten(transform(array(split(normalized(text), " ")), toks =>
      when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(
        array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))))

  /** Fixed-size overlapping token windows (context chunking for embedding /
    * RAG pipelines): chunk i covers tokens `[i·step + 1, i·step + size]`
    * with `step = size - overlap`; the last chunk may be shorter but a
    * chunk is only emitted if the previous one did not already reach the
    * end of the document (no fully-redundant tail windows). Map-side,
    * deterministic, one pass — explode the result for (doc, chunk) rows.
    */
  def tokenChunks(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = split(trim(text), s"$Ws+")
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      ceil((n - lit(chunkSize)).cast("double") / step).cast("int") + 1)
    when(length(trim(text)) === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * step + 1, lit(chunkSize)))))
  }

  /** 60-bit hash via md5 prefix. `CAST('0x' || substr(md5(s), 1, 15) AS
    * UBIGINT)` in DuckDB computes the identical value, so fingerprint
    * pipelines built on this family are end-to-end oracle-checkable —
    * hash → fingerprint → join, with no approximate/rows-only carve-out.
    * 15 hex digits (60 bits) keep the value inside a signed BIGINT on both
    * engines (no ANSI cast overflow). Prefer the fused xxhash64-family
    * expressions for pure-Spark scale paths; this one exists for queries a
    * DuckDB oracle must replay bit-for-bit.
    */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Word-bigram [[md5Hash60]] hashes (`array<long>`) — SQL-expressible
    * twin of [[wordNgramHashes]] for the oracle-bearing SimHash query:
    * words are the whitespace split of the raw text (empties dropped;
    * whitespace = RE2 `\s` = `[ \t\n\f\r]`, the class the DuckDB oracles'
    * `regexp_split_to_array(text, '\s+')` matches — see [[expressions.Md5Family]]),
    * bigram i = words(i) + " " + words(i+1). Fused single-pass kernel
    * ([[expressions.Md5WordNgramHashesExpr]]); the composed HOF form below
    * is kept for the parity pin.
    */
  def wordBigramHashes60(text: Column): Column = wordNgramHashes60(text, 2)

  /** md5Hash60 word n-gram hashes — the general form (n = 13 is the
    * exact-overlap decontamination gram size).
    */
  def wordNgramHashes60(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.Md5WordNgramHashesExpr(ColumnBridge.expression(text), n))
  }

  /** HOF-composed twin of [[wordBigramHashes60]] (interpreted per element —
    * parity-test only; measured 4× slower at sf0.1).
    */
  private[graft] def wordBigramHashes60Composed(text: Column): Column =
    flatten(transform(array(filter(split(text, "[ \\t\\n\\f\\r]+"), w => w =!= "")), ws =>
      when(size(ws) < 2, array().cast("array<long>")).otherwise(
        transform(sequence(lit(1), size(ws) - 1),
          i => md5Hash60(concat(element_at(ws, i), lit(" "),
            element_at(ws, i + 1)))))))

  /** Winnowed [[md5Hash60]] fingerprints (`array<long>`) — SQL-expressible
    * twin of [[winnowedFingerprints]]: char k-grams of lower(text), each
    * md5Hash60-hashed, thinned to the DISTINCT minima of the sliding
    * w-windows (DuckDB replays with min OVER (ROWS BETWEEN CURRENT ROW AND
    * w-1 FOLLOWING) + DISTINCT). Winnowing's guarantee holds: any shared
    * run of >= w + k - 1 characters yields a shared fingerprint. Tie /
    * consecutive-repeat handling differs from [[expressions.WinnowExpr]]
    * positionally but the selected VALUE set is identical for a given hash
    * family. Fused single-pass kernel ([[expressions.Md5WinnowExpr]]).
    */
  def winnowedFingerprints60(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.Md5WinnowExpr(ColumnBridge.expression(text), k, w))
  }

  /** HOF-composed twin of [[winnowedFingerprints60]] (interpreted per
    * element — parity-test only; measured 10× slower at sf0.1).
    */
  private[graft] def winnowedFingerprints60Composed(text: Column, k: Int, w: Int): Column =
    flatten(transform(array(lower(text)), t =>
      flatten(transform(array(
        when(length(t) < k, array().cast("array<long>")).otherwise(
          transform(sequence(lit(1), length(t) - (k - 1)),
            i => md5Hash60(t.substr(i, lit(k)))))), hs =>
        when(size(hs) < w, array().cast("array<long>")).otherwise(
          array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
            p => array_min(slice(hs, p, lit(w))))))))))

  /** PII classes for scrubbing, as (name, pattern, replacement) in
    * application order — emails first (they embed digits/dots that later
    * classes could otherwise chew on), then SSN before the generic phone
    * shape. Patterns use only syntax valid in BOTH Java regex (Spark) and
    * RE2 (DuckDB): no lookaround, no backreferences, ASCII classes — so a
    * DuckDB oracle replays the scrub verbatim.
    */
  private[graft] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("ip", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("phone", "(?:\\+?\\d{1,3}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}\\b", "<PHONE>"))

  /** Scrub PII spans (emails, SSNs, IPv4s, phone-shaped numbers) to typed
    * placeholders — the redaction step every public-web training corpus
    * runs before tokenization. One map-side chain of codegen'd
    * regexp_replace calls; deliberately conservative (a phone-shaped digit
    * run is scrubbed even when it isn't a phone — false positives cost a
    * token, false negatives leak PII).
    */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, p, r)) => regexp_replace(acc, p, r) }

  /** Per-class PII match counts over the RAW text (audit/reporting side of
    * [[scrubPii]]): struct<n_email, n_ssn, n_ip, n_phone>. Counted
    * independently per class, before any replacement.
    */
  def piiCounts(text: Column): Column =
    struct(PiiPatterns.map { case (name, p, _) =>
      regexp_count(text, lit(p)).cast("long").as(s"n_$name")
    }: _*)

  /** Shannon entropy (bits) of the character distribution — see
    * [[expressions.CharEntropyExpr]]. Low entropy flags repeated-char spam,
    * high (near log2 of the alphabet) flags base64/hex blobs; prose sits in
    * between. Fused map-side pass, oracle-replayable.
    */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.CharEntropyExpr(ColumnBridge.expression(text)))
  }

  /** Exact Jaccard similarity of two array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }
}
