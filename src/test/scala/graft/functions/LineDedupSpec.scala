package graft.functions

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "unique first line\nshared boilerplate footer\nanother unique line"),
    (2L, "different content here\nshared boilerplate footer"),
    (3L, "shared boilerplate footer"),
    (4L, "totally untouched document\nwith two lines")
  ).toDF("doc_id", "text")

  private def result = LineDedup.dedupLines(docs, "doc_id", "text")
    .as[(Long, String)].collect().toMap

  test("repeated line survives only at its first (doc, pos) occurrence") {
    val r = result
    assert(r(1L) == "unique first line\nshared boilerplate footer\nanother unique line")
    assert(r(2L) == "different content here")
    assert(!r.contains(3L), "document reduced to nothing disappears")
    assert(r(4L) == "totally untouched document\nwith two lines")
  }

  test("line order within a document is preserved after reassembly") {
    val many = Seq((1L, (0 until 50).map(i => s"line $i").mkString("\n")))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLines(many, "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(out == (0 until 50).map(i => s"line $i").mkString("\n"))
  }

  test("idempotent: a second pass changes nothing") {
    val once = LineDedup.dedupLines(docs, "doc_id", "text")
    val twice = LineDedup.dedupLines(once, "doc_id", "text")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("duplicate line within ONE document keeps only the earlier position") {
    val d = Seq((7L, "alpha\nbeta\nalpha\ngamma")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(d, "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(out == "alpha\nbeta\ngamma")
  }
}
