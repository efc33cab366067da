package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII scrubbing: class coverage, replacement order, and the conservative
  * false-positive stance. The corpus-level DuckDB oracle (`doc_pii_scrub`)
  * replays the same chain over injected PII; these pin the per-class
  * behavior on hand-written fixtures.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.scrubPii($"t")).as[String].collect().head

  private def counts(s: String): (Long, Long, Long, Long) = {
    val r = Seq(s).toDF("t").select(TextFunctions.piiCounts($"t").as("p"))
      .select($"p.n_email", $"p.n_ssn", $"p.n_ip", $"p.n_phone").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("each class is replaced with its typed placeholder") {
    assert(scrub("mail a.b+c_d%e@sub.domain.org now") == "mail <EMAIL> now")
    assert(scrub("ssn is 123-45-6789.") == "ssn is <SSN>.")
    assert(scrub("host 192.168.001.255 down") == "host <IP> down")
    assert(scrub("call +1 (555) 123-4567 or 555.123.4567") == "call <PHONE> or <PHONE>")
  }

  test("classes compose in one text and do not corrupt each other") {
    val s = "u1@x.io, 10.0.0.1, 123-45-6789, +44 123 456 7890"
    assert(scrub(s) == "<EMAIL>, <IP>, <SSN>, <PHONE>")
    assert(counts(s) == (1L, 1L, 1L, 1L))
    // an SSN-shaped span is NOT also counted as a phone (3-2-4 != 3-3-4)
    assert(counts("123-45-6789") == (0L, 1L, 0L, 0L))
  }

  test("conservative stance: phone-shaped digit runs scrub even without context") {
    assert(scrub("order id 555 123 4567 shipped") == "order id <PHONE> shipped")
  }

  test("scrubbing is idempotent: a second pass over scrubbed text is a no-op") {
    // a re-ingested already-scrubbed corpus must not mutate further (and
    // the placeholders themselves must never match a PII class)
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select($"text")
    val fixtures = Seq(
      "mail a.b+c_d%e@sub.domain.org now", "ssn is 123-45-6789.",
      "host 192.168.001.255 down", "call +1 (555) 123-4567 or 555.123.4567",
      "u1@x.io, 10.0.0.1, 123-45-6789, +44 123 456 7890",
      "<EMAIL> <SSN> <IP> <PHONE>").toDF("text")
    val once = corpus.unionByName(fixtures)
      .select(TextFunctions.scrubPii($"text").as("s1"))
    val diff = once.select($"s1", TextFunctions.scrubPii($"s1").as("s2"))
      .filter($"s1" =!= $"s2")
    assert(diff.count() == 0,
      s"second scrub changed: ${diff.take(3).map(_.getString(0).take(60)).mkString(" | ")}")
  }

  test("clean text passes through untouched with zero counts") {
    val clean = "a perfectly ordinary sentence with numbers like 12 and 345"
    assert(scrub(clean) == clean)
    assert(counts(clean) == (0L, 0L, 0L, 0L))
  }
}

/** Character-distribution entropy: hand-computed fixtures plus the
  * quality-signal ordering (prose between spam and uniform blobs).
  */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def ent(s: String): Double =
    Seq(s).toDF("t").select(TextFunctions.charEntropy($"t")).as[Double].collect().head

  test("hand-computed values: empty, uniform, skewed") {
    assert(ent("") == 0.0)
    assert(ent("aaaa") == 0.0 && !(1.0 / ent("aaaa") < 0), "no IEEE -0.0 leaks")
    assert(math.abs(ent("ab") - 1.0) < 1e-12)
    assert(math.abs(ent("abcd") - 2.0) < 1e-12)
    // p = (1/2, 1/4, 1/4) → 1.5 bits
    assert(math.abs(ent("aabc") - 1.5) < 1e-12)
  }

  test("quality ordering: repeated-char spam < prose < uniform blob") {
    val spam = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    val prose = "the quick brown fox jumps over the lazy dog near the river bank"
    val blob = ('!' to 'z').mkString // ~uniform over 90 distinct chars
    assert(ent(spam) < 1.0 && ent(prose) > 3.5 && ent(prose) < 5.0)
    assert(ent(blob) > ent(prose))
  }

  test("matches an independent code-point reference on generated strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // surrogate pairs count once (code points, not UTF-16 units) — the
    // reference recomputes from codePoints() with its own grouping
    val atom = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("é"),
      Gen.const("中"), Gen.const("😀"), Gen.const("!"),
      Gen.const("a"), Gen.const("a"))
    val strGen = Gen.choose(0, 50).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
    val generated = (0 until 200).map(i =>
      strGen.pureApply(Gen.Parameters.default, Seed(9000L + i)))
    def ref(s: String): Double =
      if (s.isEmpty) 0.0
      else {
        val cps = s.codePoints().toArray
        val n = cps.length.toDouble
        val e = -cps.groupBy(identity).values
          .map(g => g.length / n)
          .map(p => p * math.log(p) / math.log(2.0)).sum
        if (e == 0.0) 0.0 else e
      }
    val rows = generated.toDF("t")
      .select($"t", TextFunctions.charEntropy($"t").as("e")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - ref(r.getString(0))) < 1e-9,
        s"entropy mismatch on '${r.getString(0).take(30)}'")
    }
  }

  test("SQL surface: graft_char_entropy registered") {
    graft.GraftExtensions.register(spark)
    val v = spark.sql("SELECT graft_char_entropy('abcd') AS e")
      .as[Double].collect().head
    assert(math.abs(v - 2.0) < 1e-12)
  }
}
