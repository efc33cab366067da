package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hot-bucket guards: one boilerplate cluster must not be allowed to emit
  * B²/2 candidate rows through the LSH / pigeonhole joins at corpus scale.
  */
class HotBucketCapSpec extends SparkSpec {
  import spark.implicits._

  // a 30-doc identical boilerplate cluster + one genuine near-dup pair +
  // one unrelated doc
  private val boiler = (100L until 130L).map(i =>
    (i, "this exact same boilerplate license text repeats on every single page of the corpus"))
  private val docs = (boiler ++ Seq(
    (1L, "a genuinely unique document about distributed query engines and shuffles"),
    (2L, "a genuinely unique document about distributed query engines and exchanges"),
    (50L, "completely unrelated content mentioning neither licenses nor engines")
  )).toDF("doc_id", "text")

  test("minhash: cap excludes the mega-cluster, keeps the genuine pair") {
    def pairs(cap: Long) = MinHashLsh.nearDupPairs(docs, "doc_id",
      TextFunctions.charShingles($"text", 5), numHashes = 32, bands = 8,
      threshold = 0.7, maxBucketSize = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = pairs(10L)
    assert(capped.contains((1L, 2L)), "genuine near-dup survives the cap")
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      "mega-cluster pairs are excluded when every shared bucket is hot")
    val uncapped = pairs(0L)
    assert(uncapped.contains((1L, 2L)))
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } == 30 * 29 / 2,
      "uncapped finds all boilerplate pairs")
  }

  test("simhash: chunk-value cap excludes the mega-cluster, keeps the pair") {
    def pairs(cap: Long) = SimHash.nearDupPairs(docs, "doc_id",
      TextFunctions.wordNgramHashes($"text", 2), maxDist = 16, maxChunkDocs = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = pairs(10L)
    assert(capped.contains((1L, 2L)), "genuine near-dup survives the cap")
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L })
    val uncapped = pairs(0L)
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } == 30 * 29 / 2)
  }

  test("vector LSH: cap excludes a dense embedding cluster, keeps the pair") {
    // 20 identical vectors land in the same bucket of EVERY table; a genuine
    // near pair and an orthogonal vector stay in small buckets
    val dense = (100L until 120L).map(i => (i, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    val vecs = (dense ++ Seq(
      (1L, Array(0.0f, 1.0f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.12f, 0.0f)),
      (50L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    )).toDF("vec_id", "embedding")
    def pairs(cap: Long) = VectorSimilarity.thresholdJoinLsh(vecs,
      minCosine = 0.9, dim = 4, nbits = 2, tables = 8, maxBucketSize = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = pairs(10L)
    assert(capped.contains((1L, 2L)), "genuine near pair survives the cap")
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L })
    val uncapped = pairs(0L)
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } == 20 * 19 / 2)
  }

  test("recommendedBits keeps expected occupancy near the target") {
    assert(VectorSimilarity.recommendedBits(100000000L, 4096L) == 15)
    assert(VectorSimilarity.recommendedBits(4096L, 4096L) == 1)
    assert(VectorSimilarity.recommendedBits(1L, 4096L) == 1)
    // occupancy at the recommendation is within 2x of target
    val bits = VectorSimilarity.recommendedBits(1000000L, 1000L)
    val occupancy = 1000000.0 / math.pow(2, bits)
    assert(occupancy <= 1000.0 && occupancy > 250.0)
  }

  test("default cap is invisible on a normal corpus (no hot buckets)") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val sh = TextFunctions.shingleHashes(col("text"), 5)
    val capped = MinHashLsh.nearDupPairsHashed(corpus, "doc_id", sh,
      threshold = 0.8).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = MinHashLsh.nearDupPairsHashed(corpus, "doc_id", sh,
      threshold = 0.8, maxBucketSize = 0L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
  }
}
