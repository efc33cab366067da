package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{InMemoryWatermarkStore, Watermark}
import graft.operators.{Expectations, UpsertBlobDialect}

class ExpectationGateSpec extends SparkSpec {
  import spark.implicits._

  private val gate = Seq(
    Expectations.completeness("payload"),
    Expectations.uniqueness("ARCANE_MERGE_KEY", atLeast = 0.9))

  private def mkPipeline(mode: String, wms: InMemoryWatermarkStore) =
    new CdcPipeline(spark, UpsertBlobDialect,
      PipelineConfig(maintenanceEvery = 0, expectations = gate,
        onExpectationFailure = mode), wms)

  test("fail mode: violating batch stops the stream, nothing merges, no watermark") {
    val wms = new InMemoryWatermarkStore
    val target = new ParquetTarget(spark, Files.createTempDirectory("expfail").toString)
    val pipeline = mkPipeline("fail", wms)
    val rejected0 = GraftMetrics.counter(GraftMetrics.ExpectationBatchesRejected)
    val bad = Seq(("k1", 1L, Some("x")), ("k2", 1L, None))
      .toDF("ARCANE_MERGE_KEY", "createdon", "payload")
    val e = intercept[IllegalStateException] {
      pipeline.runBatch(target, "t", bad, Watermark.blob(1L))
    }
    assert(e.getMessage.contains("completeness(payload)"))
    assert(!target.exists, "nothing merged")
    assert(wms.get("t").isEmpty, "watermark NOT committed — re-pull will retry")
    assert(GraftMetrics.counter(GraftMetrics.ExpectationBatchesRejected) > rejected0)
    // the same pipeline accepts a clean batch afterwards
    val good = Seq(("k1", 2L, Some("x")), ("k2", 2L, Some("y")))
      .toDF("ARCANE_MERGE_KEY", "createdon", "payload")
    pipeline.runBatch(target, "t", good, Watermark.blob(2L))
    assert(target.read().count() == 2)
    assert(wms.get("t").map(_.version) == Some(Watermark.blob(2L).version))
  }

  test("skip mode: violating batch is quarantined — watermark advances, merge skipped") {
    val wms = new InMemoryWatermarkStore
    val target = new ParquetTarget(spark, Files.createTempDirectory("expskip").toString)
    val pipeline = mkPipeline("skip", wms)
    val bad = Seq(("k1", 1L, None: Option[String]))
      .toDF("ARCANE_MERGE_KEY", "createdon", "payload")
    pipeline.runBatch(target, "t", bad, Watermark.blob(1L))
    assert(!target.exists, "quarantined batch never reaches the target")
    assert(wms.get("t").map(_.version) == Some(Watermark.blob(1L).version),
      "watermark advanced — the stream moves past the junk batch")
    val good = Seq(("k2", 2L, Some("y"))).toDF("ARCANE_MERGE_KEY", "createdon", "payload")
    pipeline.runBatch(target, "t", good, Watermark.blob(2L))
    assert(target.read().count() == 1)
  }
}
