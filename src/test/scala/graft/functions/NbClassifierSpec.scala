package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class LabeledDoc(doc_id: Long, text: String, label: String)

/** Hashed-feature Naive Bayes: separability, frozen-model parity with the
  * distributed self-train funnel, the prior-only fallback, tie rules,
  * partitioning-independence, and stateless streaming application.
  */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two labels with disjoint vocabularies — trivially separable
  private val corpus = Seq(
    LabeledDoc(1L, "gradient descent converges on the loss surface", "ml"),
    LabeledDoc(2L, "the optimizer updates weights by gradient steps", "ml"),
    LabeledDoc(3L, "loss curves flatten as training converges", "ml"),
    LabeledDoc(4L, "simmer the onions in butter until golden", "cooking"),
    LabeledDoc(5L, "season the broth and simmer the vegetables", "cooking"),
    LabeledDoc(6L, "knead the dough and let it rest", "cooking"))

  test("self-train predicts the right label on a separable corpus") {
    val out = NbClassifier.trainScore(corpus.toDF(), "doc_id", col("text"),
        col("label"), buckets = 256)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    val truth = corpus.map(d => d.doc_id -> d.label).toMap
    assert(out == truth)
  }

  test("frozen model scores and predictions match the distributed funnel") {
    val df = corpus.toDF()
    val model = NbClassifier.train(df, col("text"), col("label"), buckets = 256)
    assert(model.labels == Seq("cooking", "ml"))
    val frozen = df.select(col("doc_id"),
        NbClassifier.predictColumn(col("text"), model).as("predicted"),
        greatest(NbClassifier.scoreColumn(col("text"), model, "cooking"),
          NbClassifier.scoreColumn(col("text"), model, "ml")).as("score"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    val batch = NbClassifier.trainScore(df, "doc_id", col("text"), col("label"),
        buckets = 256)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(frozen.map(r => (r._1, r._2)).toSeq == batch.map(r => (r._1, r._2)).toSeq)
    // scores agree to the shared rounding granularity (the fold adds per
    // token, the funnel per bucket-count — n·x vs x+…+x can differ an ulp)
    frozen.zip(batch).foreach { case (f, b) =>
      assert(math.abs(f._3 - b._3) < 2e-4, s"doc ${f._1}: ${f._3} vs ${b._3}")
    }
  }

  test("tokenless documents fall back to the max-prior label") {
    val docs = (corpus :+ LabeledDoc(7L, "", "ml")).toDF()
    val out = NbClassifier.trainScore(docs, "doc_id", col("text"), col("label"),
        buckets = 256)
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // priors: ml 4/7, cooking 3/7 → empty doc predicts ml at log2(4/7)
    assert(out(7L)._1 == "ml")
    assert(math.abs(out(7L)._2 - (math.log(4.0 / 7) / math.log(2.0))) < 1e-4)
  }

  test("exact posterior ties resolve to the ascending label") {
    // identical token distribution and priors for both labels → every
    // posterior ties → the min_by-over-(−score, label) rule picks "a"
    val twin = Seq(
      LabeledDoc(1L, "same words here", "b"), LabeledDoc(2L, "same words here", "a"),
      LabeledDoc(3L, "other tokens too", "b"), LabeledDoc(4L, "other tokens too", "a"))
    val out = NbClassifier.trainScore(twin.toDF(), "doc_id", col("text"),
        col("label"), buckets = 64)
      .as[(Long, String, Double)].collect()
    assert(out.forall(_._2 == "a"))
  }

  test("result is independent of input partitioning") {
    val base = NbClassifier.trainScore(corpus.toDF(), "doc_id", col("text"),
        col("label"), buckets = 256)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val repart = NbClassifier.trainScore(corpus.toDF().repartition(7), "doc_id",
        col("text"), col("label"), buckets = 256)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(base == repart)
  }

  test("frozen prediction applies statelessly under streaming") {
    implicit val sqlCtx = spark.sqlContext
    val model = NbClassifier.train(corpus.toDF(), col("text"), col("label"),
      buckets = 256)
    val input = MemoryStream[graft.streaming.CorpusDoc]
    val q = input.toDS().toDF()
      .select(col("doc_id"), NbClassifier.predictColumn(col("text"), model).as("predicted"))
      .writeStream.outputMode("append")
      .format("memory").queryName("nb_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("nbckpt").toString)
      .start()
    try {
      input.addData(corpus.map(d => graft.streaming.CorpusDoc(d.doc_id, d.text)): _*)
      q.processAllAvailable()
      val streamed = spark.table("nb_stream_out")
        .as[(Long, String)].collect().toMap
      assert(streamed == corpus.map(d => d.doc_id -> d.label).toMap)
    } finally q.stop()
  }
}
