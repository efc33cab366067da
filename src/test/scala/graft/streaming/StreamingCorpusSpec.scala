package graft.streaming

import graft.SparkSpec
import graft.functions.{CorpusPipeline, Sampling, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The corpus-preparation MAP-SIDE stages (quality gate, language gate,
  * deterministic split assignment) are stateless projections/filters, so
  * the same Column expressions run unchanged inside a Structured Streaming
  * query — continuous ingest gets the identical gate + split semantics the
  * batch pipeline applies, row by row, with no state store.
  */
case class CorpusDoc(doc_id: Long, text: String)
case class SourcedDoc(doc_id: Long, text: String, source: String)
case class VecRow(vec_id: Long, embedding: Array[Float])

class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.{CorpusDoc => Doc}

  private def gateAndSplit(df: DataFrame): DataFrame = {
    val st = TextFunctions.textStats(col("text"))
    df.filter(st.getField("n_chars").between(20, 20000) &&
        TextFunctions.langId(col("text")) =!= "und")
      .withColumn("split",
        Sampling.assignSplit(col("doc_id"), Seq("test" -> 0.05, "val" -> 0.05)))
  }

  test("gate + split run identically under streaming and batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = gateAndSplit(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("corpus_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("csckpt").toString)
      .start()
    val docs = Seq(
      Doc(1L, "the quick brown fox jumps over the lazy dog and runs to the river"),
      Doc(2L, "!!!"), // gated: short + no stopwords
      Doc(6L, "a document with the usual english stopwords in it for the gate"),
      Doc(27L, "another ordinary document that is full of the and of and with"))
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("corpus_stream_out")
        .select($"doc_id", $"split").as[(Long, String)].collect().toMap
      val batch = gateAndSplit(docs.toDF())
        .select($"doc_id", $"split").as[(Long, String)].collect().toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set(1L, 6L, 27L), "doc 2 gated in both modes")
      assert(streamed(27L) == "test" && streamed(6L) == "val" && streamed(1L) == "train",
        "split assignment is the same deterministic function under streaming")
    } finally q.stop()
  }

  // The Gopher repetition gate is the same stateless Column expression
  // (fused RepetitionStatsExpr, map-side) in both modes, so a continuous
  // ingest pipeline applies the identical caps the batch gate applies.
  test("repetition gate runs identically under streaming and batch") {
    implicit val sqlCtx = spark.sqlContext

    def gated(df: DataFrame): DataFrame =
      df.filter(CorpusPipeline.repetitionGate(col("text")))

    val line = "the cat sat on the mat by the door"
    val docs = Seq(
      // clean: distinct lines, varied vocabulary — survives
      Doc(1L, "the quick brown fox jumps over the lazy dog\nand then runs away to the river bank"),
      // duplicate lines: 5 identical lines → dup_line_frac 0.8 > 0.30
      Doc(2L, Seq.fill(5)(line).mkString("\n")),
      // one dominating repeated 2-gram → top2_frac over the 0.20 cap
      Doc(3L, "buy now " * 30 + "and save big today"),
      // clean multi-line document, no repeated n-gram anywhere — survives
      Doc(4L, "morning sunlight crossed the quiet valley\nfarmers gathered ripe apples before noon\nchildren walked home along dusty roads"))
    val input = MemoryStream[Doc]
    val q = gated(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("repetition_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("repckpt").toString)
      .start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("repetition_stream_out")
        .select($"doc_id").as[Long].collect().toSet
      val batch = gated(docs.toDF()).select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(1L, 4L), "repetitive docs 2 and 3 gated in both modes")
    } finally q.stop()
  }

  // PII scrubbing is a stateless regexp projection, so continuous ingest
  // redacts identically to the batch pass — no state store, no watermark.
  test("PII scrub runs identically under streaming and batch") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(1L, "reach me at a.user@mail.example.org or +1 (555) 123-4567"),
      Doc(2L, "server 10.20.30.40 logged ssn 123-45-6789 in plaintext"),
      Doc(3L, "nothing sensitive here at all"))
    val input = MemoryStream[Doc]
    val q = input.toDS().toDF()
      .select($"doc_id", TextFunctions.scrubPii($"text").as("scrubbed"))
      .writeStream.outputMode("append")
      .format("memory").queryName("pii_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("piickpt").toString)
      .start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("pii_stream_out")
        .as[(Long, String)].collect().toMap
      val batch = docs.toDF()
        .select($"doc_id", TextFunctions.scrubPii($"text").as("scrubbed"))
        .as[(Long, String)].collect().toMap
      assert(streamed == batch)
      assert(streamed(1L) == "reach me at <EMAIL> or <PHONE>")
      assert(streamed(2L) == "server <IP> logged ssn <SSN> in plaintext")
      assert(streamed(3L) == docs(2).text)
    } finally q.stop()
  }

  // The Gopher document-shape gate and the C4 line/page cleaner are pure
  // Column compositions (let-bound splits + HOF filters), so continuous
  // ingest gates and rewrites pages identically to the batch pass.
  test("gopher quality gate + C4 clean run identically under streaming and batch") {
    import graft.functions.{C4Rules, GopherQuality}
    implicit val sqlCtx = spark.sqlContext
    def cleanAndGate(df: DataFrame): DataFrame =
      df.withColumn("__c4", C4Rules.cleanText($"text"))
        .filter(C4Rules.keepPage($"text", $"__c4") &&
          GopherQuality.gate($"__c4", GopherQuality.Thresholds(minWords = 15)))
        .select($"doc_id", $"__c4".as("clean"))
    val goodPage = Seq(
      "The first sentence of this page is a perfectly ordinary one.",
      "A second complete sentence follows with the usual english words in it.",
      "The third sentence makes the page long enough to survive every floor.")
      .mkString("\n")
    val docs = Seq(
      Doc(1L, goodPage),                                   // survives
      Doc(2L, goodPage + "\nlorem ipsum filler"),          // C4 page ban
      Doc(3L, "Heading only\nAnother bare fragment"),      // C4 sentence floor
      Doc(4L, "The tiny sentence sits here.\nThe second one too now.\nThe third one ends it."))
      // ^ passes C4 (3 kept lines, 3 sentences) but fails the gopher
      //   stop-word floor: "the" is its only stop word
    val input = MemoryStream[Doc]
    val q = cleanAndGate(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_c4_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gc4ckpt").toString)
      .start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("gopher_c4_stream_out")
        .as[(Long, String)].collect().toMap
      val batch = cleanAndGate(docs.toDF()).as[(Long, String)].collect().toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set(1L))
      assert(streamed(1L) == goodPage)
    } finally q.stop()
  }

  // URL canonicalization, HTML stripping and the frozen Bloom corpus-
  // membership probe are all stateless projections — continuous ingest
  // normalizes/strips/drops identically to batch. The Bloom deployment
  // mirrors the frozen-DSIR trade: the filter is built batch-side over the
  // standing corpus, then rides the stream as a map-side predicate.
  test("URL normalize + HTML strip + frozen Bloom probe run identically under streaming") {
    import graft.functions.{BloomDedup, HtmlStrip, UrlFunctions}
    implicit val sqlCtx = spark.sqlContext
    val corpusKeys = Seq(11L, 22L, 33L).toDF("k")
    val filter = BloomDedup.buildLong(corpusKeys, $"k", 3L, 0.01)
    val docs = Seq(
      Doc(11L, "<p>HTTPS://WWW.Ex.COM:443/a//b/?utm_source=x#f</p>"),
      Doc(40L, "<script>var x;</script>clean &amp; clear"),
      Doc(22L, "plain"))
    def stage(df: DataFrame): DataFrame = df
      .select($"doc_id",
        UrlFunctions.normalizeUrl(HtmlStrip.stripHtml($"text")).as("url_norm"),
        HtmlStrip.stripHtml($"text").as("clean"))
      .filter(!BloomDedup.mightContain(filter, $"doc_id"))
    val input = MemoryStream[Doc]
    val q = stage(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("url_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("urlckpt").toString)
      .start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("url_stream_out")
        .as[(Long, String, String)].collect().toSet
      val batch = stage(docs.toDF()).as[(Long, String, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(40L), "corpus members 11/22 dropped by the probe")
      assert(streamed.head._3 == "clean & clear")
    } finally q.stop()
  }

  // PQ encoding and ADC scoring are stateless Columns once the model is
  // trained batch-side (the frozen-model deployment, same trade as the
  // frozen DSIR table / Bloom probe): a stream of new embeddings encodes
  // and scores identically to batch, row by row, no state store.
  test("frozen-model PQ encode + ADC score run identically under streaming") {
    import graft.functions.ProductQuantization
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = ProductQuantization.train(emb, "vec_id", "embedding", 64)
    val q = emb.filter(col("vec_id") === 5L)
      .select(col("embedding").cast("array<float>")).head().getSeq[Float](0).toArray
    val rows = emb.filter($"vec_id".between(200, 220))
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .as[VecRow].collect().toSeq
    def stage(df: DataFrame): DataFrame = df
      .select($"vec_id",
        ProductQuantization.encode(model, $"embedding").as("codes"),
        element_at(ProductQuantization.adcScores(model, Array(q),
          ProductQuantization.encode(model, $"embedding")), 1).as("score"))
    val input = MemoryStream[VecRow]
    val sq = stage(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("pq_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("pqckpt").toString)
      .start()
    try {
      input.addData(rows: _*)
      sq.processAllAvailable()
      val streamed = spark.table("pq_stream_out")
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSet
      val batch = stage(rows.toDF().withColumnRenamed("embedding", "embedding"))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally sq.stop()
  }

  // Budgeted mixtures are two-phase by nature: per-source token totals are
  // measured batch-side over the historical corpus (one bounded agg), and
  // the derived rates are a stateless per-key hash filter — so the SAME
  // rate map applies unchanged inside a streaming query over new ingest.
  test("budget-derived mixture rates apply statelessly under streaming") {
    implicit val sqlCtx = spark.sqlContext
    val historical = (0 until 400)
      .map(i => SourcedDoc(i.toLong, "tok " * (i % 5 + 1), s"s${i % 2}"))
    val tok = length(col("text")).cast("long")
    val rates = Sampling.mixtureWeights(
      Sampling.tokensBySource(historical.toDF(), col("source"), tok),
      Map("s0" -> 0.6, "s1" -> 0.4), tokenBudget = 500L)
    assert(rates.values.forall(r => r > 0.0 && r < 1.0), "nontrivial rates")

    val arrivals = (400 until 500)
      .map(i => SourcedDoc(i.toLong, "tok " * (i % 5 + 1), s"s${i % 3}"))
    val input = MemoryStream[SourcedDoc]
    val q = Sampling.mixtureSample(input.toDS().toDF(),
        col("doc_id"), col("source"), rates, defaultRate = 0.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("mix_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mixckpt").toString)
      .start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      val streamed = spark.table("mix_stream_out")
        .select($"doc_id").as[Long].collect().toSet
      val batch = Sampling.mixtureSample(arrivals.toDF(),
          col("doc_id"), col("source"), rates, defaultRate = 0.0)
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < arrivals.size)
      // s2 has no configured share → excluded entirely (defaultRate 0)
      assert(!streamed.exists(id => id % 3 == 2))
    } finally q.stop()
  }

  test("temperature-derived mixture rates apply statelessly under streaming") {
    // same two-phase pattern as the budget mixture: weights measured once
    // over the historical corpus (T=2 lifts the smaller source), then the
    // derived rates are a stateless hash filter any stream can apply
    implicit val sqlCtx = spark.sqlContext
    val historical = (0 until 400)
      .map(i => SourcedDoc(i.toLong, "tok " * (if (i % 4 == 0) 1 else 6), s"s${i % 2}"))
    val tok = length(col("text")).cast("long")
    val totals = Sampling.tokensBySource(historical.toDF(), col("source"), tok)
    val weights = Sampling.temperatureWeights(totals, temperature = 2.0)
    val natural = Sampling.temperatureWeights(totals, temperature = 1.0)
    val small = totals.minBy(_._2)._1
    assert(weights(small) >= natural(small), "T=2 lifts the low-resource source")
    val rates = Sampling.mixtureWeights(totals, weights, tokenBudget = 500L)

    val arrivals = (400 until 500)
      .map(i => SourcedDoc(i.toLong, "tok " * (i % 5 + 1), s"s${i % 2}"))
    val input = MemoryStream[SourcedDoc]
    val q = Sampling.mixtureSample(input.toDS().toDF(),
        col("doc_id"), col("source"), rates, defaultRate = 0.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("temp_mix_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tmixckpt").toString)
      .start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      val streamed = spark.table("temp_mix_stream_out")
        .select($"doc_id").as[Long].collect().toSet
      val batch = Sampling.mixtureSample(arrivals.toDF(),
          col("doc_id"), col("source"), rates, defaultRate = 0.0)
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < arrivals.size)
    } finally q.stop()
  }

  // DSIR deploys two-phase like the budget mixture: histograms estimated
  // batch-side over the historical corpus (bounded: `buckets` table rows),
  // then the frozen log-ratio table scores the stream as a pure fold over
  // each row's hashed buckets — no explode, no join, no state store.
  test("DSIR frozen-table scoring applies statelessly under streaming") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.Dsir
    val historical = Seq(
      SourcedDoc(0L, "alpha beta gamma alpha beta", "tgt"),
      SourcedDoc(1L, "alpha gamma beta gamma alpha", "tgt"),
      SourcedDoc(2L, "zulu yankee xray zulu whiskey", "raw"),
      SourcedDoc(3L, "yankee xray zulu xray victor", "raw"))
    val table = Dsir.frozenTable(historical.toDF(), col("text"),
      col("source") === "tgt", buckets = 256)

    val arrivals = Seq(
      SourcedDoc(10L, "alpha beta gamma", "new"),
      SourcedDoc(11L, "zulu yankee xray", "new"),
      SourcedDoc(12L, "alpha zulu", "new"),
      SourcedDoc(13L, "", "new"))
    val input = MemoryStream[SourcedDoc]
    val q = input.toDS().toDF()
      .select($"doc_id", Dsir.scoreColumn(col("text"), table).as("w"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dsirckpt").toString)
      .start()
    try {
      input.addData(arrivals: _*)
      q.processAllAvailable()
      val streamed = spark.table("dsir_stream_out")
        .select($"doc_id", $"w").as[(Long, Double)].collect().toMap
      val batch = arrivals.toDF()
        .select($"doc_id", Dsir.scoreColumn(col("text"), table).as("w"))
        .as[(Long, Double)].collect().toMap
      assert(streamed == batch)
      // target vocabulary outranks raw-only; the empty doc scores 0
      assert(streamed(10L) > streamed(11L))
      assert(streamed(13L) == 0.0)
    } finally q.stop()
  }

  test("CorpusPipeline.prepare applies the repetition caps when configured") {
    val docs = Seq(
      Doc(1L, "the quick brown fox jumps over the lazy dog and runs to the river"),
      Doc(2L, Seq.fill(5)("the cat sat on the mat by the door").mkString("\n")))
      .toDF().withColumn("source", lit("src0"))
    val base = CorpusPipeline.Config(
      nearDupThreshold = None, decontamThreshold = None)
    val without = CorpusPipeline.prepare(docs, base)
      .select($"doc_id").as[Long].collect().toSet
    val withCaps = CorpusPipeline.prepare(docs,
        base.copy(repetition = Some(CorpusPipeline.RepetitionThresholds())))
      .select($"doc_id").as[Long].collect().toSet
    assert(without == Set(1L, 2L) && withCaps == Set(1L),
      "caps off keeps both; caps on drops the duplicate-line document")
  }

  // Semantic decontamination of a live crawl against a FROZEN benchmark
  // reference: the frozen form is one broadcast array row + a stateless
  // per-row exists fold (same device as the DSIR frozen table), so an
  // append-mode stream applies the identical drop rule the batch anti-join
  // applies.
  test("frozen-reference semantic decontamination applies statelessly under streaming") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.VectorSimilarity
    val reference = Seq(
      VecRow(1000L, Array(1f, 0f, 0f, 0f)),
      VecRow(1001L, Array(0f, 1f, 0f, 0f))).toDF()
    val arrivals = Seq(
      VecRow(1L, Array(0.9f, 0.1f, 0f, 0f)),   // near ref 1000 → dropped
      VecRow(2L, Array(0f, 0f, 1f, 0f)),        // orthogonal → kept
      VecRow(3L, Array(0.3f, 0.9f, 0.1f, 0f)), // near ref 1001 → dropped
      VecRow(4L, Array(-1f, 0f, 0f, 1f)))       // negative cosine → kept
    val input = MemoryStream[VecRow]
    val q = VectorSimilarity
      .decontaminateByEmbeddingFrozen(input.toDS().toDF(), reference, minCosine = 0.4)
      .writeStream.outputMode("append")
      .format("memory").queryName("semdecon_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sdckpt").toString)
      .start()
    try {
      input.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("semdecon_stream_out")
        .select($"vec_id").as[Long].collect().toSet
      val batch = VectorSimilarity
        .decontaminateByEmbeddingFrozen(arrivals.toDF(), reference, minCosine = 0.4)
        .select($"vec_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(2L, 4L), "near-reference rows dropped in both modes")
    } finally q.stop()
  }

  // Misra–Gries is mergeable (Agarwal et al. 2013), so the same
  // TypedImperativeAggregate runs as a streaming aggregation: the bounded
  // ≤capacity summary IS the state-store row, updated batch by batch in
  // complete mode — the vocabulary-path counterpart of the stateless gates
  // above. With capacity ≥ |vocab| the summary is exact, so streamed
  // candidates must equal the batch token counts bit for bit.
  test("Misra–Gries heavy hitters aggregate identically under streaming and batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    def tokens(df: DataFrame): DataFrame =
      df.select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(length(col("tok")) > 0)
    val q = tokens(input.toDS().toDF())
      .agg(TextFunctions.misraGries(col("tok"), capacity = 64).as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("hhckpt").toString)
      .start()
    val docs = Seq(
      Doc(1L, "the cat and the dog and the bird"),
      Doc(2L, "a cat a dog a cat"),
      Doc(3L, "the end of the stream the end"))
    try {
      input.addData(docs.take(1): _*)
      q.processAllAvailable()
      input.addData(docs.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("hh_stream_out")
        .selectExpr("inline(hh)").as[(String, Long)].collect().toSeq
      val batch = tokens(docs.toDF())
        .agg(TextFunctions.misraGries(col("tok"), capacity = 64).as("hh"))
        .selectExpr("inline(hh)").as[(String, Long)].collect().toSeq
      assert(streamed == batch, "same candidates, same order, same estimates")
      val exact = tokens(docs.toDF()).groupBy($"tok").count()
        .as[(String, Long)].collect().toMap
      assert(streamed.toMap == exact, "capacity ≥ |vocab| → summary is exact")
    } finally q.stop()
  }

  // Frozen-model BM25: corpus statistics (df per query term, N, avgdl)
  // freeze once, arrivals score through the SAME stateless Column — the
  // retrieval counterpart of the DSIR/PQ frozen twins. Scores must equal
  // the batch funnel's on the training corpus itself.
  test("frozen BM25 scoring applies statelessly under streaming, matches batch ranks") {
    import graft.functions.Retrieval
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(1L, "data model training data data pipeline"),
      Doc(2L, "the model is trained on data"),
      Doc(3L, "nothing relevant here at all"),
      Doc(4L, "training training training"),
      Doc(5L, "data"))
    val terms = Seq("data", "model", "training")
    val model = Retrieval.freezeBm25(docs.toDF(), "doc_id", col("text"), terms)
    assert(model.df == Map("data" -> 3L, "model" -> 2L, "training" -> 2L))

    val input = MemoryStream[Doc]
    val q = input.toDS().toDF()
      .withColumn("score", Retrieval.bm25ScoreColumn(col("text"), model))
      .writeStream.outputMode("append")
      .format("memory").queryName("bm25_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bm25ckpt").toString)
      .start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("bm25_stream_out")
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
      val batch = Retrieval.bm25Rank(docs.toDF(), "doc_id", col("text"), terms, topK = 10)
        .as[(Long, Double)].collect().toMap
      batch.foreach { case (id, s) =>
        assert(streamed(id) == s, s"doc $id: streamed ${streamed(id)} != batch $s")
      }
      assert(streamed(3L) == 0.0, "no query term → zero score")
      assert(!batch.contains(3L), "batch funnel drops zero-hit docs before ranking")
    } finally q.stop()
  }

  // vector_mean is a TypedImperativeAggregate with a dim-length buffer, so
  // it runs as a streaming aggregation the same way Misra–Gries does: the
  // buffer is the state-store row, merged batch by batch. Sums of the same
  // values must agree with batch bit for bit (addition order differs, but
  // these fixtures are exact in binary).
  test("vector_mean centroids aggregate identically under streaming and batch") {
    import graft.functions.VectorSimilarity
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[VecRow]
    val q = input.toDS().toDF()
      .groupBy((col("vec_id") % 2).as("grp"))
      .agg(VectorSimilarity.vectorMean(col("embedding")).as("c"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("vm_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("vmckpt").toString)
      .start()
    val rows = Seq(
      VecRow(0L, Array(1f, 2f, 3f, 4f)), VecRow(1L, Array(0f, 1f, 0f, 1f)),
      VecRow(2L, Array(3f, 2f, 1f, 0f)), VecRow(3L, Array(2f, 1f, 2f, 1f)))
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("vm_stream_out")
        .as[(Long, Array[Double])].collect().toMap.view.mapValues(_.toSeq).toMap
      val batch = rows.toDF().groupBy((col("vec_id") % 2).as("grp"))
        .agg(VectorSimilarity.vectorMean(col("embedding")).as("c"))
        .as[(Long, Array[Double])].collect().toMap.view.mapValues(_.toSeq).toMap
      assert(streamed == batch)
      assert(streamed(0L) == Seq(2.0, 2.0, 2.0, 2.0), "mean of rows 0 and 2")
      assert(streamed(1L) == Seq(1.0, 1.0, 1.0, 1.0), "mean of rows 1 and 3")
    } finally q.stop()
  }

  // Under-capacity streaming run: estimates may undercount, but the MG
  // guarantee (every token with freq > N/capacity present; estimates within
  // N/capacity of truth) must hold across micro-batch merges.
  test("streaming Misra–Gries keeps its error guarantee below capacity") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val capacity = 4
    def tokens(df: DataFrame): DataFrame =
      df.select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(length(col("tok")) > 0)
    val q = tokens(input.toDS().toDF())
      .agg(TextFunctions.misraGries(col("tok"), capacity).as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_cap_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("hhcapckpt").toString)
      .start()
    val docs = Seq(
      Doc(1L, ("alpha " * 20) + ("beta " * 12) + "one two three"),
      Doc(2L, ("alpha " * 10) + ("gamma " * 9) + "four five six"),
      Doc(3L, ("beta " * 8) + "seven eight nine ten"))
    try {
      docs.foreach { d => input.addData(d); q.processAllAvailable() }
      val est = spark.table("hh_cap_stream_out")
        .selectExpr("inline(hh)").as[(String, Long)].collect().toMap
      val exact = tokens(docs.toDF()).groupBy($"tok").count()
        .as[(String, Long)].collect().toMap
      val n = exact.values.sum
      val slack = n / capacity
      exact.foreach { case (tok, c) =>
        if (c > slack) assert(est.contains(tok), s"frequent '$tok' ($c > $slack) must survive")
      }
      est.foreach { case (tok, e) =>
        val c = exact(tok)
        assert(e <= c && e >= c - slack, s"'$tok' estimate $e outside [${c - slack}, $c]")
      }
    } finally q.stop()
  }
}
