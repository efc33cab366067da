package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The md5Hash60 family exists so DuckDB oracles can replay fingerprint
  * funnels bit-for-bit (`dedup_simhash`, `dedup_winnow`). These pins keep
  * the two engines' definitions from drifting: the constant below is
  * DuckDB's `CAST('0x' || substr(md5('hello'), 1, 15) AS UBIGINT)`.
  */
class Md5HashFamilySpec extends SparkSpec {
  import spark.implicits._

  test("md5Hash60 matches the DuckDB hex-prefix value on a known string") {
    val v = Seq("hello").toDF("s")
      .select(TextFunctions.md5Hash60($"s").as("h")).as[Long].collect().head
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592 → 0x5d41402abc4b2a7
    assert(v == 419982666956583591L)
    assert(v >= 0L, "60-bit values never reach the sign bit")
  }

  test("wordBigramHashes60: bigrams over the \\s+ split, empties dropped") {
    val got = Seq("  a  b\tc ", "solo", "").toDF("s")
      .select(TextFunctions.wordBigramHashes60($"s").as("h"))
      .as[Seq[Long]].collect()
    val exp = Seq("a b", "b c").map { g =>
      Seq(g).toDF("s").select(TextFunctions.md5Hash60($"s").as("h"))
        .as[Long].collect().head
    }
    assert(got(0) == exp, "bigram hashes in order, whitespace-insensitive")
    assert(got(1).isEmpty && got(2).isEmpty, "fewer than 2 words → empty")
  }

  test("fused kernels match the HOF-composed forms on the corpus + fixtures") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
      .select($"text").union(Seq("", " ", "one", "a b", "a  b\tc\nd",
        "the quick brown fox jumps over the lazy dog",
        // \x0B is NOT whitespace in RE2 \s (the oracle's split class) —
        // both the fused kernel and the composed form must treat it as a
        // word character
        "a\u000Bb c d",
        // non-ASCII: multi-byte UTF-8 words and case-mapped letters pin
        // fused ≡ composed beyond the ASCII corpus
        "Äpfel ÜBER Größe naïve café déjà vu",
        "ΑΒΓ δεζ ΗΘΙ κλμ").toDF("text"))
    val bigrams = docs.select(
      TextFunctions.wordBigramHashes60($"text").as("fused"),
      TextFunctions.wordBigramHashes60Composed($"text").as("composed"))
      .collect()
    bigrams.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "bigram hash parity")
    }
    val winnow = docs.select(
      TextFunctions.winnowedFingerprints60($"text", 5, 8).as("fused"),
      TextFunctions.winnowedFingerprints60Composed($"text", 5, 8).as("composed"))
      .collect()
    winnow.foreach { r =>
      assert(r.getSeq[Long](0).sorted == r.getSeq[Long](1).sorted, "winnow parity")
    }
  }

  test("md5Hash60 matches a JDK MessageDigest reference on generated strings") {
    // independent reference: the JDK digest + hex-prefix arithmetic, no
    // Catalyst — cross-checks the fused expression's UTF-8 byte handling
    // over generated strings stressing multi-byte and pinned-class edges
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val atom = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\t"),
      Gen.const(""), Gen.const(" "), Gen.const("é"), Gen.const("ß"),
      Gen.const("中"), Gen.const("😀"), Gen.const("é"),
      Gen.const("!"), Gen.const("."))
    val strGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
    val generated = (0 until 200).map(i =>
      strGen.pureApply(Gen.Parameters.default, Seed(8000L + i)))
    def ref(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rows = generated.toDF("s")
      .select($"s", TextFunctions.md5Hash60($"s").as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == ref(r.getString(0)),
        s"md5Hash60 mismatch on '${r.getString(0).take(30)}'")
    }
    // fused vs HOF-composed bigram kernels over the same generated set
    val bi = generated.toDF("text").select(
      TextFunctions.wordBigramHashes60($"text").as("fused"),
      TextFunctions.wordBigramHashes60Composed($"text").as("composed"), $"text")
      .collect()
    bi.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"bigram parity broke on '${r.getString(2).take(30)}'")
    }
  }

  test("non-ASCII corpus: simhash funnel matches DuckDB bit-for-bit") {
    // Engine-vs-engine parity beyond ASCII: these expected values are
    // DuckDB's answer for dedup_simhash's exact oracle SQL over this
    // fixture (replay: load the (doc_id, text) rows into DuckDB and run
    // the dedup_simhash funnel from SparkEntry.oracleSql — the md5
    // word-bigram hashes, the 60-bit sign aggregation, and the
    // hamming<=8 self-join). Covers multi-byte UTF-8 (umlauts, Greek,
    // CJK), astral-plane emoji (4-byte UTF-8), NBSP (\u00A0 — NOT
    // whitespace in either engine's split), and VT 0x0B (vertical tab —
    // Java \s matches it, RE2 \s does not; the pinned class keeps it a
    // word character on both sides).
    val docs = Seq(
      1L -> "Äpfel über größe naïve café déjà vu münchen straße weiß",
      2L -> "Äpfel über größe naïve café déjà vu münchen straße schwarz",
      3L -> "αλφα βητα γαμμα δελτα εψιλον ζητα ητα θητα ιωτα κάππα",
      4L -> "αλφα βητα γαμμα δελτα εψιλον ζητα ητα θητα ιωτα λάμδα",
      5L -> "東京 大阪 京都 奈良 札幌 福岡 神戸 横浜 仙台 広島",
      6L -> "日本 東京 大阪 京都 奈良 札幌 福岡 神戸 横浜 仙台 広島",
      7L -> "🍎 tarte\u00A0aux pommes 🍊 jus d'orange frais très bon",
      8L -> "αβ\u000Bγδ εζ ηθ ικ λμ νξ οπ ρσ τυ φχ"
    ).toDF("doc_id", "text")
    val fps = SimHash.fingerprintsHashed(docs, "doc_id",
        TextFunctions.wordBigramHashes60($"text"))
      .as[(Long, Long)].collect().toMap
    val duckdbFps = Map(
      1L -> 791728650752245118L, 2L -> 251859713972387198L,
      3L -> 802724958078436031L, 4L -> 773451560466451135L,
      5L -> 656818962696584267L, 6L -> 655675470603695179L,
      7L -> 92640820010717443L, 8L -> 785579316284532695L)
    assert(fps == duckdbFps, "60-bit simhash fingerprints vs DuckDB")
    val pairs = SimHash.nearDupPairsHashed(docs, "doc_id",
        TextFunctions.wordBigramHashes60($"text"), maxDist = 8)
      .select($"id_a", $"id_b", $"hamming".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L, 7L), (5L, 6L, 3L)),
      "near-dup pairs at hamming<=8 vs DuckDB")
  }

  test("winnowedFingerprints60: shared run >= w+k-1 chars shares a fingerprint") {
    val run = "the quick brown fox jumps over"   // 30 chars >= 8+5-1
    val df = Seq(
      s"AAAA $run BBBB",
      s"zzzz $run yyyy",
      "completely different material here with no common passage at all"
    ).toDF("text")
    val fps = df.select(
      TextFunctions.winnowedFingerprints60($"text", k = 5, w = 8).as("f"))
      .as[Seq[Long]].collect()
    assert(fps(0).intersect(fps(1)).nonEmpty, "winnowing guarantee")
    assert(fps(0).intersect(fps(2)).isEmpty ||
      fps(0).intersect(fps(2)).size < fps(0).intersect(fps(1)).size)
    // shorter than k+w-1 normalized chars → no full window → no fingerprints
    val short = Seq("tiny doc").toDF("text")
      .select(TextFunctions.winnowedFingerprints60($"text", 5, 8).as("f"))
      .as[Seq[Long]].collect().head
    assert(short.isEmpty)
  }
}
