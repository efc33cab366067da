package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class PageDoc(doc_id: Long, text: String)

/** Hand-computed fixtures for the two public cleaning rule-sets: the Gopher
  * document-shape quality signals (Rae et al. 2021 table A1) and the C4
  * line/page rules (Raffel et al. 2020 §2.2). The oracle-bearing queries
  * check the funnels end to end over the corpus; these pin the per-rule
  * semantics on documents small enough to verify by hand.
  */
class GopherC4Spec extends SparkSpec {
  import spark.implicits._

  // a document that passes every Gopher rule: > 50 words, prose-shaped,
  // stopword-rich, no bullets / ellipses / symbols
  private val goodBody: String =
    (Seq.fill(6)("the quick brown fox and other animals of that kind have " +
      "come along with us to town before the market opened today").mkString(" "))

  private def stats1(text: String) =
    Seq(PageDoc(1L, text)).toDF()
      .select(GopherQuality.stats(col("text")).as("st"))
      .select(col("st.n_words"), col("st.mean_word_len"),
        col("st.symbol_word_ratio"), col("st.bullet_line_frac"),
        col("st.ellipsis_line_frac"), col("st.alpha_word_frac"),
        col("st.stopword_hits"), col("st.n_lines"))
      .head()

  private def keeps(text: String): Boolean =
    Seq(PageDoc(1L, text)).toDF()
      .filter(GopherQuality.gate(col("text"))).count() == 1L

  test("gopher stats: hand-computed signals on a crafted page") {
    val text = "The cat runs far\n- bullet item\nthis one trails off...\n### 12"
    val r = stats1(text)
    // words: The cat runs far - bullet item this one trails off... ### 12  → 13
    assert(r.getLong(0) == 13L)
    // chars: 3+3+4+3+1+6+4+4+3+6+6+3+2 = 48 → 48/13
    assert(math.abs(r.getDouble(1) - 48.0 / 13) < 1e-12)
    // symbols: '...' once + '#' ×3 → 4/13
    assert(math.abs(r.getDouble(2) - 4.0 / 13) < 1e-12)
    // lines: 4 non-blank; 1 bullet; 1 ellipsis-ended
    assert(r.getLong(7) == 4L)
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-12)
    // alpha words: all but '-', '###', '12' → 10/13
    assert(math.abs(r.getDouble(5) - 10.0 / 13) < 1e-12)
    // stop words present: the, this→no. {The(→the), one? no} → the only
    assert(r.getLong(6) == 1L)
  }

  test("gopher stats: empty and blank text") {
    val r = stats1("")
    assert(r.getLong(0) == 0L && r.getLong(7) == 0L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(5) == 0.0)
    assert(!keeps(""))
  }

  test("gopher gate: the good page passes, each broken rule fails alone") {
    assert(keeps(goodBody), "baseline page must pass every rule")
    // word count below 50
    assert(!keeps("the cat and the hat have fun with all of that"))
    // mean word length above 10
    assert(!keeps(Seq.fill(60)("supercalifragilistic").mkString(" ") +
      " the and of that have with"))
    // symbol-to-word ratio above 0.1
    assert(!keeps(goodBody + " " + Seq.fill(20)("#").mkString(" ")))
    // bullet lines above 90%
    assert(!keeps((1 to 30).map(i => s"- item number $i of the set").mkString("\n")))
    // ellipsis endings above 30%
    assert(!keeps(goodBody.split(" ").grouped(10).map(_.mkString(" ") + "...")
      .mkString("\n")))
    // alphabetic-word fraction below 80%
    assert(!keeps(goodBody + " " + (1 to 40).map(_.toString).mkString(" ")))
    // fewer than 2 distinct stop words
    assert(!keeps(Seq.fill(60)("colorful mountain valley stream").mkString(" ")))
  }

  test("gopher gate equals gateOn(stats) on the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val viaGate = docs.filter(GopherQuality.gate(col("text")))
      .select(col("doc_id")).as[Long].collect().toSet
    val viaStats = docs.filter(GopherQuality.gateOn(GopherQuality.stats(col("text"))))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(viaGate == viaStats)
  }

  private def cleaned(text: String): String =
    Seq(PageDoc(1L, text)).toDF()
      .select(C4Rules.cleanText(col("text")).as("c")).head().getString(0)

  test("c4 line rules: terminal punctuation, word floor, javascript") {
    val page = Seq(
      "A heading with no terminal punctuation",            // dropped: no punct
      "This line has five good words.",                    // dropped: 5 required? has 6 → kept
      "Too short a line.",                                 // dropped: 4 words
      "Please enable JavaScript to see this content.",     // dropped: javascript
      "My javascripted gadget works well enough today.",   // kept: \b rule
      "Does a question mark count as terminal here?",      // kept
      "He said \"this quoted ending counts too\"")         // kept: closing quote
      .mkString("\n")
    assert(cleaned(page) == Seq(
      "This line has five good words.",
      "My javascripted gadget works well enough today.",
      "Does a question mark count as terminal here?",
      "He said \"this quoted ending counts too\"").mkString("\n"))
  }

  test("c4 page gates: sentences floor, lorem ipsum, curly brace") {
    val goodLines = Seq(
      "The first sentence of the page ends here.",
      "A second complete sentence follows the first one.",
      "The third sentence makes the page long enough.")
    def survives(text: String): Boolean =
      C4Rules.clean(Seq(PageDoc(1L, text)).toDF()).count() == 1L
    assert(survives(goodLines.mkString("\n")))
    // two sentences only → below the 3-sentence floor
    assert(!survives(goodLines.take(2).mkString("\n")))
    // lorem ipsum anywhere on the RAW page poisons it, even in a dropped line
    assert(!survives((goodLines :+ "lorem ipsum filler").mkString("\n")))
    // curly brace anywhere on the raw page poisons it
    assert(!survives((goodLines :+ "function() { return 1; }").mkString("\n")))
  }

  test("c4 clean keeps survivors with text_clean replacing the body") {
    val docs = Seq(
      PageDoc(1L, "One full sentence stands alone here."),  // < 3 sentences
      PageDoc(2L, Seq(
        "The first sentence of the page ends here.",
        "A second complete sentence follows the first one.",
        "Dropped heading line",
        "The third sentence makes the page long enough.").mkString("\n"))).toDF()
    val out = C4Rules.clean(docs).select(col("doc_id"), col("text_clean"))
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(2L))
    assert(!out(2L).contains("Dropped heading line"))
    assert(out(2L).split("\n").length == 3)
  }
}
