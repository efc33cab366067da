package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML strip fixtures: every chain step on hand-written markup, the
  * ordering guarantees (script content never leaks; `&amp;` decodes last),
  * idempotence on already-clean text, and the outlink counter.
  */
class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  private def strip(hs: String*): Seq[String] =
    hs.toDF("h").select(HtmlStrip.stripHtml($"h")).as[String].collect().toSeq

  test("tags, blocks and comments vanish; text and entity decodes survive") {
    assert(strip(
      """<html><head><SCRIPT src="x">if (a < b) { hide(); }</script><style>p{}</style>
        |</head><body><!-- note --><h1>Hi</h1> <p class="a">one &amp; two &lt;three&gt;</p>
        |</body></html>""".stripMargin)
      == Seq("Hi one & two <three>"))
    assert(strip("a &nbsp; b &#39;q&#39; &quot;r&quot;") == Seq("a b 'q' \"r\""))
  }

  test("script content never leaks even with tricky internals; case-insensitive") {
    val got = strip("<ScRiPt>var s = '</p>never';</ScRiPt>ok",
      "<STYLE media=\"x\">.a{content:'>'}</STYLE>fine")
    assert(!got(0).contains("never") && got(0).endsWith("ok"))
    assert(got(1) == "fine")
  }

  test("&amp; decodes last: double-encoded text decodes exactly one level") {
    assert(strip("&amp;lt;b&amp;gt;") == Seq("&lt;b&gt;"))
  }

  test("idempotent on clean text; whitespace collapses; multiline tags handled") {
    val clean = "plain prose, no markup at all"
    assert(strip(clean) == Seq(clean))
    assert(strip("a\n\n\t b <div\n  class='x'>c</div>") == Seq("a b c"))
  }

  test("linkCount counts hrefs in raw markup only") {
    val got = Seq(
      "<a href=\"/x\">l</a> and <A\nHREF='y'>m</A>",
      "<a name=\"no-href\">anchor</a> plain a href text")
      .toDF("h").select(HtmlStrip.linkCount($"h")).as[Long].collect().toSeq
    assert(got == Seq(2L, 0L))
  }
}
