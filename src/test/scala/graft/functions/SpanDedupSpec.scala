package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // k = 4 throughout; hand-computed coverages
  private def corpus = Seq(
    (1L, "a b c d e f"),          // holds the FIRST occurrence of "a b c d"
    (2L, "x y a b c d z"),        // re-uses it at pos 3 -> dup_tokens 4 of 7
    (3L, "p q r s t"),            // unique text
    (4L, "m n o p m n o p"),      // self-repeat: pos 5 duplicates pos 1
    (5L, "g h i j k"),            // first occurrences of two overlapping spans
    (6L, "g h i j k w")           // both re-used: [1,5) U [2,6) = 5 of 6
  ).toDF("doc_id", "text")

  test("coverageStats: first occurrence kept, overlaps counted once, self-repeats counted") {
    val out = SpanDedup.coverageStats(corpus, "doc_id", col("text"), k = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 0L, 0.0)), "first occurrence is never duplicated")
    assert(out(2L) == ((7L, 4L, 0.5714)))
    assert(out(3L) == ((5L, 0L, 0.0)))
    assert(out(4L) == ((8L, 4L, 0.5)), "within-document repeat counts")
    assert(out(5L) == ((5L, 0L, 0.0)))
    assert(out(6L) == ((6L, 5L, 0.8333)), "overlapping spans union, not sum")
  }

  test("documents shorter than k emit no spans but still get a stats row") {
    val tiny = Seq((1L, "a b"), (2L, ""), (3L, "a b c d a b c d")).toDF("doc_id", "text")
    val out = SpanDedup.coverageStats(tiny, "doc_id", col("text"), k = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)))
    assert(out(2L) == ((0L, 0L, 0.0)))
    assert(out(3L) == ((8L, 4L, 0.5)))
  }

  test("dropHighOverlap removes exactly the above-threshold documents") {
    val kept = SpanDedup.dropHighOverlap(corpus, "doc_id", col("text"),
      k = 4, maxFrac = 0.5).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("spliceDuplicates removes all-but-first occurrences, word-aligned") {
    val out = SpanDedup.spliceDuplicates(corpus, "doc_id", col("text"), k = 4)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a b c d e f", "first occurrence untouched")
    assert(out(2L) == "x y z", "the re-used span is cut, surroundings kept")
    assert(out(3L) == "p q r s t")
    assert(out(4L) == "m n o p", "self-repeat keeps the first copy")
    assert(out(5L) == "g h i j k")
    assert(out(6L) == "w", "overlapping duplicated spans cut as a union")
    // an empty document survives as an empty clean text
    val tiny = Seq((9L, "")).toDF("doc_id", "text")
    assert(SpanDedup.spliceDuplicates(tiny, "doc_id", col("text"), k = 4)
      .as[(Long, String)].collect().toMap == Map(9L -> ""))
  }

  test("assignment is partition-independent") {
    val a = SpanDedup.coverageStats(corpus, "doc_id", col("text"), k = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = SpanDedup.coverageStats(corpus.repartition(7), "doc_id", col("text"), k = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
