package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.expressions.{BpeCountExpr, BpeDecodeExpr, BpeEncodeExpr}

/** Byte-level merge-table BPE (the public GPT-2 algorithm: Sennrich et al.
  * 2016 "Neural Machine Translation of Rare Words with Subword Units",
  * plus the byte-fallback alphabet of Radford et al. 2019) — so token
  * budgets, chunk sizes and mixture weights can be measured in TOKENIZER
  * tokens rather than whitespace words.
  *
  * The vocabulary is supplied at runtime as a merge table (ordered pairs,
  * rank = priority, the `merges.txt` format), never baked into code: load
  * one with [[BpeVocab.fromMergesText]], train one deterministically with
  * [[Bpe.train]] / [[Bpe.trainFromDataFrame]].
  *
  * Scale shape: encoding is a pure per-row function (a narrow projection —
  * no shuffle, no UDF; the vocab rides along as a codegen reference object,
  * exactly like the IVF codebook in `NearestCentroidsExpr`). Training is
  * driver-side over a BOUNDED deterministic sample — the standard practice
  * for fitting a tokenizer (nobody trains BPE on all 100 TB), mirroring the
  * IVF codebook's fixed-size-sample contract.
  *
  * Byte-level means lossless: `decode(encode(s)) == s` for EVERY string —
  * property-tested, and the invariant that makes token-window chunking
  * reconstruction-exact.
  */
object Bpe {

  /** Token ids of `text` under `vocab`, as `array<int>`. Narrow, codegen. */
  def encode(text: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(text), vocab))

  /** Token count of `text` under `vocab` — the budget column. Cheaper than
    * `size(encode(...))`: no per-row array materialization.
    */
  def tokenCount(text: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(text), vocab))

  /** UTF-8 string for an `array<int>` of token ids (inverse of [[encode]]). */
  def decode(ids: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeDecodeExpr(ColumnBridge.expression(ids), vocab))

  /** BPE-budgeted context chunking: fixed-size overlapping TOKEN windows,
    * decoded back to text. Same window/tail-suppression contract as
    * `TextFunctions.tokenChunks` but measured in tokenizer tokens; with
    * `overlap = 0` the chunks concatenate back to exactly the original
    * text (byte-level BPE is lossless).
    */
  def tokenChunks(text: Column, vocab: BpeVocab, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    // let-bind the encode through a single-element array so the interpreted
    // path never re-tokenizes per chunk (HOF lambda re-evaluation pitfall)
    flatten(transform(array(encode(text, vocab)), ids => {
      val n = size(ids)
      val nChunks = when(n <= chunkSize, lit(1)).otherwise(
        ceil((n - lit(chunkSize)).cast("double") / step).cast("int") + 1)
      // guard n == 0 outside the sequence: sequence(0, -1) would descend
      when(n === 0, array().cast("array<string>")).otherwise(
        transform(sequence(lit(0), nChunks - 1),
          i => decode(slice(ids, i * step + 1, lit(chunkSize)), vocab)))
    }))
  }

  /** Deterministic greedy BPE training (public algorithm): repeatedly merge
    * the most frequent adjacent token pair; frequency ties break
    * lexicographically so the result is independent of iteration order.
    * Driver-side — meant for test vocabularies and bounded corpus samples.
    */
  def train(corpus: Iterable[String], numMerges: Int): BpeVocab = {
    import scala.collection.mutable
    // word -> frequency, each word as its byte-char token sequence
    val words = mutable.HashMap.empty[List[String], Long]
    corpus.foreach { doc =>
      BpeVocab.preTokenize(doc).foreach { w =>
        val toks = BpeVocab.toByteTokens(w)
        if (toks.nonEmpty) words(toks) = words.getOrElse(toks, 0L) + 1L
      }
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var table = words.toMap
    var k = 0
    while (k < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      table.foreach { case (toks, f) =>
        toks.zip(toks.tail).foreach(p => pairCounts(p) = pairCounts.getOrElse(p, 0L) + f)
      }
      if (pairCounts.isEmpty) k = numMerges
      else {
        val best = pairCounts.toSeq
          .maxBy { case ((a, b), f) => (f, a, b) }(
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse))
          ._1
        merges += best
        table = table.map { case (toks, f) => (mergeWord(toks, best._1, best._2), f) }
        k += 1
      }
    }
    BpeVocab(merges.toIndexedSeq)
  }

  /** Greedy left-to-right non-overlapping collapse of one merge rule over a
    * word's token sequence — the single definition both the local and the
    * distributed trainer apply, so their merge sequences cannot drift.
    */
  private[graft] def mergeWord(toks: List[String], a: String, b: String): List[String] = {
    val joined = a + b
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var rest = toks
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tl if x == a && y == b => out += joined; rest = tl
        case x :: tl => out += x; rest = tl
        case Nil => ()
      }
    }
    out.toList
  }

  /** DISTRIBUTED BPE training over the FULL corpus — the 100 TB path the
    * sampled trainer deliberately avoids. The corpus collapses once into a
    * distributed (word-type, frequency) table (distinct pre-tokens — the
    * only state, and it shrinks as merges fuse tokens); each merge round is
    * then one bounded aggregation: adjacent-pair counts weighted by word
    * frequency, `orderBy(...).limit(1)` (a TakeOrdered, no full sort)
    * sending exactly ONE row to the driver. Word bodies re-map per round
    * with [[mergeWord]] — the same collapse the local trainer applies, and
    * frequency ties break by the same (count, pair) ordering, so the merge
    * SEQUENCE is identical to [[train]] run over the same corpus
    * (spec-pinned in `BpeSpec`).
    *
    * Cost: numMerges rounds × (one map + one pair-count shuffle over word
    * TYPES, not corpus rows). Lineage is cut every `checkpointEvery` rounds
    * so round N's plan doesn't carry N map stages. Driver state: the merge
    * list (≤ numMerges pairs) — never a sample, never the corpus.
    */
  def trainDistributed(df: DataFrame, textCol: String, numMerges: Int,
                       checkpointEvery: Int = 16): BpeVocab = {
    val spark = df.sparkSession
    import spark.implicits._
    require(numMerges >= 0 && checkpointEvery >= 1)
    var words = df.select(col(textCol).cast("string").as("__t"))
      .filter(col("__t").isNotNull).as[String]
      .flatMap(t => BpeVocab.preTokenize(t))
      .groupBy(col("value")).agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => (BpeVocab.toByteTokens(w).toArray, f) }
      .filter(_._1.nonEmpty)
      .persist()
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      // one bounded agg per merge round; exactly one row reaches the driver
      val top = words.flatMap { case (toks, f) =>
        (0 until toks.length - 1).iterator.map(i => (toks(i), toks(i + 1), f)) }
        .groupBy(col("_1"), col("_2")).agg(sum(col("_3")).as("__f"))
        .orderBy(col("__f").desc, col("_1").asc, col("_2").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += ((a, b))
        val prev = words
        val mapped = prev.map { case (toks, f) =>
          (mergeWord(toks.toList, a, b).toArray, f) }
        words =
          if ((k + 1) % checkpointEvery == 0) mapped.localCheckpoint()
          else mapped.persist()
        words.count()
        prev.unpersist()
        k += 1
      }
    }
    words.unpersist()
    BpeVocab(merges.toIndexedSeq)
  }

  /** Train over a bounded, DETERMINISTIC sample of a corpus column: the
    * sample is the `maxSampleRows` rows with the smallest `xxhash64(text)`
    * (seed-stable, partition-independent), collected to the driver. Sample
    * cost is one pass + a top-k; the 100 TB corpus never moves.
    */
  def trainFromDataFrame(df: DataFrame, textCol: String, numMerges: Int,
                         maxSampleRows: Int = 8192): BpeVocab = {
    val sample = df.select(col(textCol).cast("string").as("__t"))
      .filter(col("__t").isNotNull)
      .orderBy(xxhash64(col("__t")))
      .limit(maxSampleRows)
      .collect().map(_.getString(0))
    train(sample, numMerges)
  }
}

/** A BPE merge table plus the derived token id space: ids 0-255 are the
  * byte alphabet (GPT-2's printable byte-to-unicode bijection), id 256+i is
  * the product of merge rule i. Serializable — ships to executors inside
  * the encode/decode expressions.
  */
final case class BpeVocab(merges: IndexedSeq[(String, String)]) extends Serializable {

  /** rank (priority) per pair; lower merges first. */
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.putIfAbsent(a + " " + b, i) }
    m
  }

  /** token string -> id. */
  @transient lazy val tokenIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](256 + merges.size * 2)
    var b = 0
    while (b < 256) { m.put(String.valueOf(BpeVocab.byteChar(b)), b); b += 1 }
    merges.zipWithIndex.foreach { case ((a, c), i) => m.putIfAbsent(a + c, 256 + i) }
    m
  }

  /** id -> token string (byte-char alphabet). */
  @transient lazy val idTokens: Array[String] = {
    val out = new Array[String](256 + merges.size)
    var b = 0
    while (b < 256) { out(b) = String.valueOf(BpeVocab.byteChar(b)); b += 1 }
    merges.zipWithIndex.foreach { case ((a, c), i) => out(256 + i) = a + c }
    out
  }

  def size: Int = 256 + merges.size

  /** Per-instance (= per-task after deserialization) pre-token encode cache:
    * natural language repeats words heavily, so most pre-tokens hit. Bounded
    * — cleared when it outgrows 64k entries.
    */
  @transient lazy val encodeCache: java.util.concurrent.ConcurrentHashMap[String, Array[Int]] =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]](1024)

  /** `merges.txt` serialization (one `A B` pair per line). */
  def toMergesText: String = merges.map { case (a, b) => s"$a $b" }.mkString("\n")
}

object BpeVocab {

  /** The empty vocabulary: pure byte-level tokens, count == UTF-8 length. */
  val bytes: BpeVocab = BpeVocab(Vector.empty)

  /** Parse `merges.txt` content: one pair per line, `#`-prefixed headers and
    * blank lines ignored.
    */
  def fromMergesText(text: String): BpeVocab =
    BpeVocab(text.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && i < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }.toIndexedSeq)

  /** GPT-2's byte-to-unicode bijection: printable latin bytes map to
    * themselves, the rest shift into U+0100.. so every token serializes as
    * visible characters. Public-domain construction (Radford et al. 2019).
    */
  private val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var shifted = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + shifted).toChar; shifted += 1 }
      b += 1
    }
    out
  }

  private val charToByte: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](512)
    var b = 0
    while (b < 256) { m.put(byteToChar(b), b); b += 1 }
    m
  }

  def byteChar(b: Int): Char = byteToChar(b & 0xFF)
  def charByte(c: Char): Int = {
    val v = charToByte.get(c)
    if (v == null) -1 else v.intValue()
  }

  /** GPT-2 pre-tokenization pattern: contractions, letter runs, digit runs,
    * punctuation runs, trailing/other whitespace — applied before merges so
    * tokens never span word boundaries.
    */
  private val prePattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  def preTokenize(text: String): List[String] = {
    val m = prePattern.matcher(text)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toList
  }

  /** A pre-token's UTF-8 bytes as single-char token strings. */
  def toByteTokens(word: String): List[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => String.valueOf(byteChar(b & 0xFF))).toList
}
