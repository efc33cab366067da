package graft.streaming

import graft.SparkSpec
import graft.functions.CorpusPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

class CorpusIngestSinkSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = CorpusPipeline.Config(
    minChars = 10, requireKnownLang = false,
    nearDupThreshold = None, decontamThreshold = None)

  private val baseA = "the quick brown fox jumps over the lazy dog again and again today"
  private val baseB = "completely different content about spark query engines operating at corpus scale"

  test("micro-batches gate against the growing corpus; replay admits nothing") {
    val dir = Files.createTempDirectory("corpus_ingest").toString
    val sc = spark.sparkContext
    val rddsBefore = sc.getPersistentRDDs.keySet.toSet

    // batch 1: two distinct docs → both admitted
    val b1 = Seq((1L, baseA, "web"), (2L, baseB, "web")).toDF("doc_id", "text", "source")
    assert(CorpusIngestSink.processBatch(spark, dir, b1, cfg) == 2L)
    assert(spark.read.parquet(dir).count() == 2)

    // batch 2: an exact dup of doc 1, a NEAR dup of doc 2 (one word edited),
    // and one genuinely new doc → only the new doc is admitted
    val b2 = Seq(
      (10L, baseA, "web"),                                   // exact dup of 1
      (11L, baseB + " today", "web"),                        // near dup of 2
      (12L, "an entirely new document mentioning benchmarks and shuffles", "web"))
      .toDF("doc_id", "text", "source")
    assert(CorpusIngestSink.processBatch(spark, dir, b2, cfg) == 1L)
    val ids = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 12L), s"got $ids")

    // replay of an already-committed batch admits nothing (the retry path
    // where the write committed but the checkpoint didn't)
    assert(CorpusIngestSink.processBatch(spark, dir, b2, cfg) == 0L)
    assert(spark.read.parquet(dir).count() == 3)

    // cache hygiene: every funnel cache released, batch after batch
    assert((sc.getPersistentRDDs.keySet.toSet -- rddsBefore).isEmpty,
      "prepareIncremental's corpus-key and candidate caches must be released per batch")
  }

  test("streaming end to end through foreachBatch") {
    val dir = Files.createTempDirectory("corpus_ingest_stream").toString
    val ckpt = Files.createTempDirectory("corpus_ingest_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "text", "source")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(CorpusIngestSink.foreachBatchFn(dir, cfg))
      .start()
    try {
      input.addData((1L, baseA, "web"), (2L, baseB, "web"))
      q.processAllAvailable()
      input.addData((10L, baseA, "web"), (12L, "fresh prose about watermark discipline in stream processing", "web"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 12L), s"got $ids")
    // every row carries the deterministic split assignment
    val splits = spark.read.parquet(dir).select("split").distinct()
      .as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "test", "val")))
  }
}
