package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  test("hand-computed mean log2 probability over a tiny corpus") {
    // corpus tokens: a a b  → p(a) = 2/3, p(b) = 1/3
    val out = UnigramLm.score(Seq((1L, "a a b")).toDF("doc_id", "text"),
        "doc_id", col("text"))
      .as[(Long, Long, Double)].collect().head
    val expected = (2 * log2(2.0 / 3) + log2(1.0 / 3)) / 3
    assert(out._2 == 3L)
    assert(math.abs(out._3 - BigDecimal(expected)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("garbled documents score below prose from the same corpus") {
    val prose = (1 to 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again"))
    val garbled = Seq((99L, "zxqv wkjh qpzm vbnx lkjq"))
    val out = UnigramLm.score((prose ++ garbled).toDF("doc_id", "text"),
        "doc_id", col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(99L) < out(1L), "rare-token soup scores lower")
    assert(out.values.forall(_ < 0.0), "log probabilities are negative")
  }

  test("ppl buckets: equal-count tiers, head holds the best scores") {
    val prose = (1 to 6).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val soup = (7 to 9).map(i => (i.toLong, s"zxq$i wkj$i qpz$i"))
    val out = UnigramLm.buckets((prose ++ soup).toDF("doc_id", "text"),
        "doc_id", col("text"))
      .select("doc_id", "logprob", "bucket")
      .as[(Long, Double, String)].collect()
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(out.length == 9 && byBucket.values.forall(_.length == 3),
      "ntile splits 9 docs into equal thirds")
    assert(byBucket("head").min >= byBucket("middle").max,
      "head scores at or above middle")
    assert(byBucket("middle").min >= byBucket("tail").max)
    // generic tier count labels as qN
    val q5 = UnigramLm.buckets((prose ++ soup).toDF("doc_id", "text"),
        "doc_id", col("text"), nBuckets = 5)
      .select("bucket").as[String].collect().toSet
    assert(q5 == Set("q1", "q2", "q3", "q4", "q5"))
  }

  test("vocab cap sends rarer tokens to the OOV floor; empty docs score 0") {
    // 6 tokens total: "a" ×5 in vocab, "b" (rank 2) falls outside cap 1
    val docs = Seq((1L, "a a a a a"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val out = UnigramLm.score(docs, "doc_id", col("text"), vocabSize = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((5L, r4(log2(5.0 / 6)))))
    assert(out(2L) == ((1L, r4(log2(0.5 / 6)))), "OOV floor p = 0.5/N")
    assert(out(3L) == ((0L, 0.0)))
  }

  test("bigram score is order-sensitive where the unigram score cannot be") {
    // the corpus is dominated by one word ORDER; a shuffled doc has the
    // identical unigram distribution, so only the bigram model separates
    val docs = (Seq.tabulate(20)(i => (i.toLong, "a b c d e")) ++
      Seq((100L, "a b c d e"), (101L, "e d c b a"))).toDF("doc_id", "text")
    val uni = UnigramLm.score(docs, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(uni(100L) == uni(101L), "unigram score is order-blind")
    val bi = UnigramLm.scoreBigram(docs, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(bi(100L)._2 > bi(101L)._2,
      s"in-order ${bi(100L)._2} must beat reversed ${bi(101L)._2}")
    assert(bi(100L)._1 == 4 && bi(101L)._1 == 4, "4 bigrams in a 5-token doc")
  }

  test("scoreBigram: sub-bigram documents score 0; hand-check one value") {
    val docs = Seq((1L, "x x"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val out = UnigramLm.scoreBigram(docs, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((0L, 0.0)) && out(3L) == ((0L, 0.0)))
    // corpus: tokens = [x, x, x], N = 3; bigrams: (x,x) ×1 → table cnt 1;
    // cnt(x) = 3; p = 0.75·(1/3) + 0.25·(3/3) = 0.5 → log2 = -1
    assert(out(1L) == ((1L, -1.0)), s"got ${out(1L)}")
  }

  test("bucketsByThreshold approximates the exact ntile tiers map-side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = UnigramLm.buckets(docs, "doc_id", col("text"))
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    val approx = UnigramLm.bucketsByThreshold(docs, "doc_id", col("text"))
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(approx.keySet == exact.keySet)
    // population sizes agree within sketch error + score ties
    val sizes = approx.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = approx.size
    Seq("head", "middle", "tail").foreach { t =>
      val s = sizes.getOrElse(t, 0)
      assert(math.abs(s - n / 3.0) < n * 0.15, s"tier $t size $s of $n")
    }
    val agree = approx.count { case (id, b) => exact(id) == b }
    assert(agree > n * 0.9, s"only $agree/$n tier assignments agree")
    // deterministic under repartition
    val again = UnigramLm.bucketsByThreshold(docs.repartition(13), "doc_id", col("text"))
      .select($"doc_id", $"bucket").as[(Long, String)].collect().toMap
    assert(again == approx)
  }
}
