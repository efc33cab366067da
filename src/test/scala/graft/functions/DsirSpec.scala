package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: target docs speak "alpha", raw-only docs
  // speak "zulu" — so the importance score must separate them cleanly
  private def corpus = Seq(
    (0L, "alpha beta gamma alpha beta", "tgt"),
    (1L, "alpha gamma beta gamma", "tgt"),
    (2L, "zulu yankee xray zulu", "raw"),
    (3L, "yankee xray zulu xray", "raw"),
    (4L, "alpha beta gamma", "raw"),   // raw doc with target vocabulary
    (5L, "", "raw")
  ).toDF("doc_id", "text", "kind")

  test("tokenBuckets stay in range and ignore extra whitespace") {
    val b = Seq(("a  b\t c", 0)).toDF("text", "x")
      .select(explode(Dsir.tokenBuckets(col("text"), 64)).as("b"))
      .as[Long].collect()
    assert(b.length == 3)
    assert(b.forall(v => v >= 0 && v < 64))
  }

  test("score ranks target-like above raw-only documents") {
    val out = Dsir.score(corpus, "doc_id", col("text"), col("kind") === "tgt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // raw contains the target, so calibration is RELATIVE: a raw document
    // written in the target vocabulary outranks every raw-only document
    assert(out(4L)._2 > out(2L)._2 && out(4L)._2 > out(3L)._2,
      s"target-vocab doc ${out(4L)._2} vs raw-only ${out(2L)._2} / ${out(3L)._2}")
    assert(out(0L)._2 > out(2L)._2 && out(1L)._2 > out(3L)._2)
    // token counts and the empty document
    assert(out(0L)._1 == 5 && out(4L)._1 == 3)
    assert(out(5L) == ((0L, 0.0)))
  }

  test("resample returns exactly k dense-ranked rows, partition-independent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dsir.resample(docs, "doc_id", col("text"), col("lang") === "en", k = 50)
      .select($"doc_id", $"rank").as[(Long, Long)].collect()
    assert(out.length == 50)
    assert(out.map(_._2).sorted.toSeq == (1L to 50L).toSeq)
    val again = Dsir.resample(docs.repartition(13), "doc_id", col("text"),
      col("lang") === "en", k = 50)
      .select($"doc_id", $"rank").as[(Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // a smaller selection is a prefix of a larger one (same key order)
    val k20 = Dsir.resample(docs, "doc_id", col("text"), col("lang") === "en", k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(k20.subsetOf(out.map(_._1).toSet))
  }

  test("bigram features (the paper's other order) preserve the separation") {
    val out = Dsir.score(corpus, "doc_id", col("text"), col("kind") === "tgt",
        ngram = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // n-gram count = words - 1; the empty doc still scores 0
    assert(out(0L)._1 == 4 && out(4L)._1 == 2 && out(5L) == ((0L, 0.0)))
    assert(out(4L)._2 > out(2L)._2 && out(0L)._2 > out(3L)._2)
  }

  test("frozen-table scoring reproduces the batch funnel") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val table = Dsir.frozenTable(docs, col("text"), col("lang") === "en")
    assert(table.length == 4096)
    val viaTable = docs.select($"doc_id",
        Dsir.tokenCountColumn(col("text")).as("n_tokens"),
        Dsir.scoreColumn(col("text"), table).as("dsir_logratio"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val viaBatch = Dsir.score(docs, "doc_id", col("text"), col("lang") === "en")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(viaTable.toSeq == viaBatch.toSeq)
  }

  test("resampling favors higher-scoring documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scores = Dsir.score(docs, "doc_id", col("text"), col("lang") === "en")
    val picked = Dsir.resample(docs, "doc_id", col("text"), col("lang") === "en", k = 100)
      .select("doc_id")
    val meanAll = scores.agg(avg($"dsir_logratio")).as[Double].head()
    val meanPicked = scores.join(picked, "doc_id")
      .agg(avg($"dsir_logratio")).as[Double].head()
    assert(meanPicked > meanAll,
      s"selected mean $meanPicked should exceed corpus mean $meanAll")
  }
}
