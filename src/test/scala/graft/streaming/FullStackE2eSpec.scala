package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{InMemoryWatermarkStore, Watermark}
import graft.functions.Drift
import graft.operators.{Expectations, IncrementalAgg, MsSqlCtDialect}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The grand composition: the DSv2 versioned change stream drives ONE
  * foreachBatch that runs the whole day-2 stack —
  *
  *   admission (expectations) → drift watch (frozen PSI) → dedup + merge +
  *   watermark ([[CdcPipeline.runBatch]]) → aggregate-view maintenance
  *   ([[ViewSink]] on its own targets, same batches)
  *
  * and every layer's invariant holds at the end: target state, committed
  * watermark, emitted metrics, and view ≡ bootstrap-of-state. Each piece
  * has its own spec; this one pins that they COMPOSE.
  */
class FullStackE2eSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ARCANE_MERGE_KEY", StringType),
    StructField("SYS_CHANGE_VERSION", LongType),
    StructField("SYS_CHANGE_OPERATION", StringType),
    StructField("payload", StringType)))

  test("stream -> gates -> merge -> watermark -> maintained view, all invariants") {
    val feed = new TestFeed
    VersionedStreamRegistry.register("full-stack-feed", feed)
    val wms = new InMemoryWatermarkStore
    val target = new ParquetTarget(spark, Files.createTempDirectory("fs_tgt").toString)
    val viewT = new ParquetTarget(spark, Files.createTempDirectory("fs_view").toString)
    val stateT = new ParquetTarget(spark, Files.createTempDirectory("fs_state").toString)

    // frozen drift reference over the version feature (versions 1..4)
    val frozen = Drift.freezeNumeric((1L to 4L).toDF("SYS_CHANGE_VERSION"),
      col("SYS_CHANGE_VERSION"), edges = Seq(3.0, 6.0))
    val pipeline = new CdcPipeline(spark, MsSqlCtDialect,
      PipelineConfig(keyColumn = "ARCANE_MERGE_KEY", maintenanceEvery = 0,
        expectations = Seq(Expectations.completeness("ARCANE_MERGE_KEY")),
        driftMonitor = Some(DriftMonitorConfig("SYS_CHANGE_VERSION", frozen))), wms)

    val rows0 = GraftMetrics.counter(GraftMetrics.RowsIncoming)

    val q = spark.readStream
      .format(classOf[VersionedStreamProvider].getName)
      .option("source.name", "full-stack-feed")
      .option("source.shards", "2")
      .schema(schema)
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("fs_ck").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val maxV = batch.agg(max(col("SYS_CHANGE_VERSION"))).head().getLong(0)
          pipeline.runBatch(target, "fs", batch, Watermark.mssql(maxV))
          ViewSink.processBatch(viewT, stateT, batch, "ARCANE_MERGE_KEY",
            MsSqlCtDialect, groupCols = Seq("SYS_CHANGE_OPERATION"), valueCol = "SYS_CHANGE_VERSION")
        }
        ()
      }
      .start()

    try {
      feed.version = 4
      q.processAllAvailable()
      feed.version = 7 // v5 deletes k1, v6 updates k0, v7 re-inserts k1
      q.processAllAvailable()
    } finally q.stop()

    // merge target: same truth as VersionedStreamSpec's direct merge
    val state = target.read().select($"ARCANE_MERGE_KEY", $"payload")
      .as[(String, String)].collect().toMap
    assert(state == Map("k1" -> "p7", "k2" -> "p2", "k0" -> "p6"))

    // watermark committed to the LAST consumed version
    assert(wms.get("fs").map(_.version) == Some(Watermark.mssql(7L).version))

    // observability saw the rows and scored every batch's drift
    assert(GraftMetrics.counter(GraftMetrics.RowsIncoming) > rows0)
    assert(GraftMetrics.gaugeValue(GraftMetrics.DriftPsiMilli).nonEmpty)

    // the maintained view never drifted from its own state
    val recomputed = IncrementalAgg.bootstrap(stateT.read(),
      Seq("SYS_CHANGE_OPERATION"), "SYS_CHANGE_VERSION")
    def norm(df: DataFrame) = df
      .select($"SYS_CHANGE_OPERATION", $"cnt".cast("long"), round($"sum_value", 6))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(norm(viewT.read()) == norm(recomputed))
  }
}
