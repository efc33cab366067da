package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (CCNet/RefinedWeb line dedup): lines in
  * more than `maxDocFreq` distinct documents are stripped, everything
  * else keeps its original order. The oracle-bearing
  * `doc_strip_boilerplate` query checks the full funnel against DuckDB;
  * these fixtures pin the operator semantics the synthetic corpus can't
  * exercise (multi-line docs, all-boilerplate docs, within-doc repeats).
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val header = "SITE NAV | home | products | contact"
  private val footer = "(c) example corp - all rights reserved"

  private def clean(rows: Seq[(Long, String)], cap: Long): Map[Long, (String, Long)] =
    LineDedup.stripBoilerplate(rows.toDF("doc_id", "text"), "doc_id",
        col("text"), maxDocFreq = cap)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("lines shared across > maxDocFreq docs are stripped; unique prose keeps its order") {
    val docs = Seq(
      (1L, s"$header\nfirst article body\nmore first text\n$footer"),
      (2L, s"$header\nsecond article entirely different\n$footer"),
      (3L, s"$header\nthird doc prose\n$footer"),
      (4L, "standalone document with no boilerplate at all"))
    val out = clean(docs, cap = 2L)
    assert(out(1L) == (("first article body\nmore first text", 2L)))
    assert(out(2L) == (("second article entirely different", 2L)))
    assert(out(3L) == (("third doc prose", 2L)))
    assert(out(4L) == (("standalone document with no boilerplate at all", 0L)))
  }

  test("a document that is ALL boilerplate keeps an empty text_clean, nothing is lost") {
    val docs = Seq(
      (1L, s"$header\n$footer"),
      (2L, s"$header\nbody two\n$footer"),
      (3L, s"$header\nbody three\n$footer"))
    val out = clean(docs, cap = 2L)
    assert(out(1L) == (("", 2L)), "all lines hot -> empty doc, still present")
    assert(out(2L) == (("body two", 2L)))
    assert(out.size == 3, "every input row survives")
  }

  test("within-doc repeats count once toward document frequency and move together") {
    // the repeated line sits in only TWO docs (<= cap), so it must stay —
    // including both copies in doc 1; doc frequency is a cross-doc signal
    val docs = Seq(
      (1L, "chorus line\nverse one\nchorus line"),
      (2L, "chorus line\nother verse"),
      (3L, "unrelated text entirely"))
    val out = clean(docs, cap = 2L)
    assert(out(1L) == (("chorus line\nverse one\nchorus line", 0L)))
    assert(out(2L) == (("chorus line\nother verse", 0L)))
    // at cap 1 the shared line is hot: BOTH copies in doc 1 go
    val strict = clean(docs, cap = 1L)
    assert(strict(1L) == (("verse one", 2L)))
    assert(strict(2L) == (("other verse", 1L)))
  }

  test("single-line and empty documents round-trip") {
    val docs = Seq((1L, "only line"), (2L, ""))
    val out = clean(docs, cap = 5L)
    assert(out(1L) == (("only line", 0L)))
    assert(out(2L) == (("", 0L)), "an empty text is one empty line, kept")
  }

  // ---- dedupLines: the C4 exact first-occurrence rule ----

  private val c4docs = Seq(
    (1L, "unique first line\nshared boilerplate footer\nanother unique line"),
    (2L, "different content here\nshared boilerplate footer"),
    (3L, "shared boilerplate footer"),
    (4L, "totally untouched document\nwith two lines")
  ).toDF("doc_id", "text")

  test("dedupLines: repeated line survives only at its first (doc, pos) occurrence") {
    val r = LineDedup.dedupLines(c4docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "unique first line\nshared boilerplate footer\nanother unique line")
    assert(r(2L) == "different content here")
    assert(!r.contains(3L), "document reduced to nothing disappears")
    assert(r(4L) == "totally untouched document\nwith two lines")
  }

  test("dedupLines: line order within a document is preserved after reassembly") {
    val many = Seq((1L, (0 until 50).map(i => s"line $i").mkString("\n")))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLines(many, "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(out == (0 until 50).map(i => s"line $i").mkString("\n"))
  }

  test("dedupLines: idempotent — a second pass changes nothing") {
    val once = LineDedup.dedupLines(c4docs, "doc_id", "text")
    val twice = LineDedup.dedupLines(once, "doc_id", "text")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("dedupLines: duplicate line within ONE document keeps only the earlier position") {
    val d = Seq((7L, "alpha\nbeta\nalpha\ngamma")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(d, "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(out == "alpha\nbeta\ngamma")
  }
}
