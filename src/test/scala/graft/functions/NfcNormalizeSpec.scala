package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unicode NFC contracts: decomposed sequences compose, idempotence, the
  * fast path leaves normalized text untouched, and the property the op
  * exists for — byte-different spellings of the same text fingerprint
  * identically after NFC.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(ss: String*): Seq[String] =
    ss.toDF("s").select(TextFunctions.nfcNormalize($"s")).as[String].collect().toSeq

  test("decomposed combining marks compose to the precomposed forms") {
    assert(nfc("Café", "über", "Ångström")
      == Seq("Café", "über", "Ångström"))
  }

  test("idempotent; ASCII and already-composed text pass through unchanged") {
    val fixed = Seq("plain ascii", "Café über", "", "  spaces  ")
    assert(nfc(fixed: _*) == fixed)
    assert(nfc(nfc("Café"): _*) == nfc("Café"))
  }

  test("null stays null; char count shrinks only when marks compose") {
    val rows = Seq[(java.lang.Long, String)]((1L, "é"), (2L, null))
      .toDF("id", "s")
      .select($"id", TextFunctions.nfcNormalize($"s").as("n"),
        length(TextFunctions.nfcNormalize($"s")).as("l"))
      .collect()
    assert(rows(0).getString(1) == "é" && rows(0).getInt(2) == 1)
    assert(rows(1).isNullAt(1))
  }

  test("byte-different spellings fingerprint identically after NFC") {
    val got = Seq("résumé draft", "résumé draft")
      .toDF("s")
      .select(TextFunctions.fingerprint(TextFunctions.nfcNormalize($"s")).as("fp"))
      .as[String].collect()
    assert(got(0) == got(1), "NFC must unify the fingerprints")
    val raw = Seq("résumé draft", "résumé draft")
      .toDF("s").select(TextFunctions.fingerprint($"s").as("fp"))
      .as[String].collect()
    assert(raw(0) != raw(1), "without NFC the control must differ for this test to mean anything")
  }
}
