package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{InMemoryWatermarkStore, Watermark}
import graft.functions.Drift
import graft.operators.UpsertBlobDialect
import org.apache.spark.sql.functions.col

class DriftWatchSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch PSI gauge updates; only drifted batches flag; merge unaffected") {
    val edges = Seq(100.0, 200.0, 300.0)
    val reference = (1 to 400).map(i => (s"r$i", 0L, (i % 4) * 100 + 50))
      .toDF("ARCANE_MERGE_KEY", "createdon", "len")
    val frozen = Drift.freezeNumeric(reference, col("len"), edges)

    val wms = new InMemoryWatermarkStore
    val target = new ParquetTarget(spark, Files.createTempDirectory("driftw").toString)
    val pipeline = new CdcPipeline(spark, UpsertBlobDialect,
      PipelineConfig(maintenanceEvery = 0,
        driftMonitor = Some(DriftMonitorConfig("len", frozen))), wms)

    val flagged0 = GraftMetrics.counter(GraftMetrics.DriftBatchesFlagged)

    // in-distribution batch: same bucket mixture as the reference
    val inDist = (1 to 100).map(i => (s"k$i", 1L, (i % 4) * 100 + 50))
      .toDF("ARCANE_MERGE_KEY", "createdon", "len")
    pipeline.runBatch(target, "t", inDist, Watermark.blob(1L))
    val psiInDist = GraftMetrics.gaugeValue(GraftMetrics.DriftPsiMilli).get
    assert(psiInDist < 100, s"in-distribution batch must score near-zero PSI, got $psiInDist")
    assert(GraftMetrics.counter(GraftMetrics.DriftBatchesFlagged) == flagged0)

    // drifted batch: every value lands in the top bucket
    val drifted = (1 to 100).map(i => (s"d$i", 2L, 999))
      .toDF("ARCANE_MERGE_KEY", "createdon", "len")
    pipeline.runBatch(target, "t", drifted, Watermark.blob(2L))
    val psiDrift = GraftMetrics.gaugeValue(GraftMetrics.DriftPsiMilli).get
    assert(psiDrift > 1000, s"disjoint batch must score PSI >> 0.25, got milli=$psiDrift")
    assert(GraftMetrics.counter(GraftMetrics.DriftBatchesFlagged) == flagged0 + 1)

    // observability only: both batches merged, watermark advanced
    assert(target.read().count() == 200)
    assert(wms.get("t").map(_.version) == Some(Watermark.blob(2L).version))
  }
}
