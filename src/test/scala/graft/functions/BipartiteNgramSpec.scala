package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BipartiteNgramSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "an entirely different sentence about spark engines"),
    (3L, "shared filler gram gram gram everywhere")
  ).toDF("id", "text")

  private val right = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (11L, "the quick brown fox leaps over the lazy dog"), // near dup of 1
    (12L, "completely unrelated held out content here")
  ).toDF("id", "text")

  test("bipartite pairs find cross-corpus near-dups, never within-side pairs") {
    val pairs = NgramJaccard.bipartitePairs(left, right, "id",
      TextFunctions.wordNgramHashes(col("text"), 3), threshold = 0.35,
      maxDocFreq = 0L)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 10L), (1L, 11L)),
      s"got ${pairs.toSeq}")
    val exact = pairs.find(p => p._2 == 10L).get
    assert(exact._3 == 1.0, "exact duplicate scores jaccard 1.0")
    assert(pairs.find(p => p._2 == 11L).get._3 < 1.0)
  }

  test("stop-gram cap prunes grams frequent across BOTH sides") {
    // "gram" appears in doc 3 only once per side requirement: craft a gram in
    // every doc of both sides; with cap 1 it must not produce candidates
    val l = Seq((1L, "common token alpha"), (2L, "common token beta")).toDF("id", "text")
    val r = Seq((10L, "common token gamma"), (11L, "common token delta")).toDF("id", "text")
    // 2-grams: "common token" occurs in all 4 docs (df=4 > cap=1) → pruned;
    // remaining grams are unique per doc → no pair reaches threshold
    val pairs = NgramJaccard.bipartitePairs(l, r, "id",
      TextFunctions.wordNgramHashes(col("text"), 2), threshold = 0.3,
      maxDocFreq = 1L)
    assert(pairs.count() == 0)
    // uncapped, the shared gram creates candidate pairs
    val uncapped = NgramJaccard.bipartitePairs(l, r, "id",
      TextFunctions.wordNgramHashes(col("text"), 2), threshold = 0.3,
      maxDocFreq = 0L)
    assert(uncapped.count() > 0)
  }
}
