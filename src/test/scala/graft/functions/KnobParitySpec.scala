package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-10 perf knobs must not change results — each flag trades plan
  * shape (exchange pinning, eager materialization, decode elision) for the
  * caller's context, so every (true, false) pair is asserted bit-identical
  * here, and the decode-free metadata path is asserted against the decode
  * path it replaces.
  */
class KnobParitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "an entirely different sentence about spark engines"),
    (4L, ""),
    (5L, "solo")
  ).toDF("id", "text")

  test("scoreBigram(materialize = false) is bit-identical to the default") {
    def run(m: Boolean) =
      UnigramLm.scoreBigram(docs, "id", col("text"), materialize = m)
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(true) == run(false))
  }

  test("bipartitePairs(pinExchange = false) is bit-identical to the default") {
    val left = docs.filter($"id" <= 2)
    val right = docs.filter($"id" >= 3)
      .unionByName(Seq((10L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text"))
    def run(p: Boolean) =
      NgramJaccard.bipartitePairs(left, right, "id",
        TextFunctions.wordNgramHashes(col("text"), 3), threshold = 0.3,
        maxDocFreq = 0L, pinExchange = p)
        .collect().map(_.toSeq).toSet
    val pinned = run(true)
    assert(pinned.nonEmpty, "fixture must produce at least one cross-side pair")
    assert(pinned == run(false))
  }

  test("payloadMeta matches extractFeatures' byte counts without decoding") {
    val media = Multimodal.synthesizeImages(Seq(0L, 7L, 42L).toDF("doc_id"), "doc_id")
    val viaDecode = Multimodal.extractFeatures(media)
      .select($"media_id", $"n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val metaOnly = Multimodal.payloadMeta(media).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(metaOnly == viaDecode)
  }

  test("payloadMeta counts a null payload as 0 bytes") {
    val media = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("media_id", "payload")
    val out = Multimodal.payloadMeta(media).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 0))
  }

  test("encodePng rejects a negative id with a clear message") {
    val e = intercept[IllegalArgumentException](Multimodal.encodePng(-1L))
    assert(e.getMessage.contains("non-negative"))
  }
}
