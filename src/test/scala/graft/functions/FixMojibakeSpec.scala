package graft.functions

import graft.SparkSpec

/** Mojibake-repair contracts: the single- and double-encoded cases repair,
  * and everything the transform must NOT touch stays untouched — ASCII,
  * genuine Latin-1-looking text, real multilingual text, already-clean
  * UTF-8.
  */
class FixMojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def fix(ss: String*): Seq[String] =
    ss.toDF("s").select(TextFunctions.fixMojibake($"s")).as[String].collect().toSeq

  // build mojibake programmatically: encode UTF-8, re-read as Latin-1
  private def garble(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  test("single-encoded mojibake repairs to the original") {
    val clean = Seq("café au lait", "naïve résumé", "Größe Ärger", "χαίρετε")
    assert(fix(clean.map(garble): _*) == clean)
  }

  test("double-encoded mojibake repairs in bounded rounds") {
    val clean = "déjà vu"
    assert(fix(garble(garble(clean))) == Seq(clean))
  }

  test("ASCII, real multilingual text, and already-clean UTF-8 pass through") {
    val keep = Seq("plain ascii only", "你好世界", "Привет мир", "café")
    assert(fix(keep: _*) == keep)
  }

  test("genuine Latin-1-looking text is not corrupted") {
    // isolated high chars that are NOT valid UTF-8 sequences must survive
    val latin1ish = Seq("50° N", "±5 µm", "A×B÷C")
    assert(fix(latin1ish: _*) == latin1ish)
  }
}
