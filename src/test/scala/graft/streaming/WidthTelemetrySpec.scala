package graft.streaming

import graft.SparkSpec
import graft.operators.Scd2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ListenerBridge

/** The SCD2 auto-width sizing decision must surface as metrics: the derived
  * bucket width and the floor-dominated flag ride `Dataset.observe` on the
  * width frame's own execution (no extra jobs) and land in GraftMetrics via
  * GraftObservationListener — the candidate-tightness degradation on
  * timestamp/LSN version domains is a dashboard signal, not a silent choice.
  */
class WidthTelemetrySpec extends SparkSpec {
  import spark.implicits._

  private def drain(): Unit = ListenerBridge.waitUntilListenerBusEmpty(spark)

  test("auto-width gauge fires with the computed width; floor flag off on a median-dominated history") {
    val listener = new GraftObservationListener
    spark.listenerManager.register(listener)
    try {
      GraftMetrics.reset()
      // 200 single-version closed intervals → median length 1, floor tiny
      val h = Scd2.buildHistory(
        (1L to 200L).map(v => ("hot", v, s"s$v", false))
          .toDF("k", "v", "state", "del"), "k", "v", Seq("state"), $"del")
      val facts = (1L to 200L by 10L).map(v => ("hot", v)).toDF("k", "fv")
      val expectedW = Scd2.autoBucketWidthFrame(h, facts, col("fv"))
        .collect()(0).getLong(0)
      assert(expectedW == 1L, s"fixture drifted: median width $expectedW")

      Scd2.asOfJoinBucketedAuto(facts, h, "k", col("fv")).collect()
      drain()
      assert(GraftMetrics.gaugeValue(GraftMetrics.Scd2AutoWidth).contains(expectedW),
        s"width gauge must fire with the derived width, got ${GraftMetrics.snapshot()}")
      assert(GraftMetrics.gaugeValue(GraftMetrics.Scd2AutoWidthFloored).contains(0L),
        "median-dominated fixture must not report the floor flag")
    } finally spark.listenerManager.unregister(listener)
  }

  test("floor-dominated domain (timestamp-scale versions) raises the flag and the floored width") {
    val listener = new GraftObservationListener
    spark.listenerManager.register(listener)
    try {
      GraftMetrics.reset()
      // median closed length 2, but facts reach 1e10 → span/4096 floor wins
      val h = Seq(
        ("k1", "a", 1L, Some(3L)), ("k1", "b", 3L, Some(5L)),
        ("k1", "c", 5L, None: Option[Long]))
        .toDF("k", "state", "valid_from", "valid_to")
      val far = 10_000_000_000L
      val facts = Seq(("k1", 2L), ("k1", 4L), ("k1", far)).toDF("k", "fv")
      val expectedW = Scd2.autoBucketWidthFrame(h, facts, col("fv"))
        .collect()(0).getLong(0)
      assert(expectedW >= far / 4096L, s"fixture drifted: floor width $expectedW")

      Scd2.asOfJoinBucketedAuto(facts, h, "k", col("fv")).collect()
      drain()
      assert(GraftMetrics.gaugeValue(GraftMetrics.Scd2AutoWidth).contains(expectedW),
        s"width gauge must carry the floored width, got ${GraftMetrics.snapshot()}")
      assert(GraftMetrics.gaugeValue(GraftMetrics.Scd2AutoWidthFloored).contains(1L),
        "span-floor domination must surface as the degradation flag")
    } finally spark.listenerManager.unregister(listener)
  }

  test("two auto-width joins compose in ONE query (observation names must not collide)") {
    // Spark rejects duplicate observation names within a query unless they
    // are the same Dataset — the per-call #suffix keeps composition legal,
    // and the listener still gauges under the stable base name
    val listener = new GraftObservationListener
    spark.listenerManager.register(listener)
    try {
      GraftMetrics.reset()
      val h1 = Seq(("k1", "a", 1L, None: Option[Long]))
        .toDF("k", "state", "valid_from", "valid_to")
      val h2 = Seq(("k1", "x", 1L, None: Option[Long]))
        .toDF("k", "state2", "valid_from", "valid_to")
      val facts = Seq(("k1", 5L)).toDF("k", "fv")
      val once = Scd2.asOfJoinBucketedAuto(facts, h1, "k", col("fv"))
        .select($"k", $"fv", $"state")
      val twice = Scd2.asOfJoinBucketedAuto(once, h2, "k", col("fv"))
        .select($"k", $"fv", $"state", $"state2")
      assert(twice.collect().toSeq ==
        Seq(org.apache.spark.sql.Row("k1", 5L, "a", "x")))
      drain()
      assert(GraftMetrics.gaugeValue(GraftMetrics.Scd2AutoWidth).isDefined,
        "composed observations must still land under the stable metric name")
    } finally spark.listenerManager.unregister(listener)
  }

  test("spark.graft.scd2.widthTelemetry=false drops the observation, same rows") {
    val listener = new GraftObservationListener
    spark.listenerManager.register(listener)
    try {
      GraftMetrics.reset()
      val h = Seq(("k1", "a", 1L, None: Option[Long]))
        .toDF("k", "state", "valid_from", "valid_to")
      val facts = Seq(("k1", 5L)).toDF("k", "fv")
      spark.conf.set("spark.graft.scd2.widthTelemetry", "false")
      val rows = try Scd2.asOfJoinBucketedAuto(facts, h, "k", col("fv"))
        .select($"k", $"fv", $"state").collect().toSeq
      finally spark.conf.unset("spark.graft.scd2.widthTelemetry")
      drain()
      assert(rows == Seq(org.apache.spark.sql.Row("k1", 5L, "a")),
        "the toggle must not change join semantics")
      assert(GraftMetrics.gaugeValue(GraftMetrics.Scd2AutoWidth).isEmpty,
        "telemetry off must emit no width observation")
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming path: the enrich observation surfaces through query progress") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.nio.file.Files
    val target = new ParquetTarget(spark,
      Files.createTempDirectory("wt_scd2").toString)
    Scd2Sink.processBatch(target,
      Seq(("k1", 1L, "a", false), ("k1", 5L, "b", false))
        .toDF("k", "v", "state", "del"), "k", "v", Seq("state"), $"del")
    val sl = new GraftStreamingListener
    spark.streams.addListener(sl)
    try {
      GraftMetrics.reset()
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long)]
      // per-batch enrich: the auto-width observation sits inside the batch
      // plan driven by foreachBatch, so it lands via the BATCH listener; a
      // plan-level observe on the streaming frame itself would instead
      // surface in progress.observedMetrics (forwarded by
      // GraftStreamingListener — the path this test registers)
      val obsListener = new GraftObservationListener
      spark.listenerManager.register(obsListener)
      try {
        val q = input.toDS().toDF("k", "fv").writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("wt_ck").toString)
          .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
            Scd2Sink.enrich(target, df, "k", col("fv")).collect(); ()
          })
          .start()
        try {
          input.addData(("k1", 2L), ("k1", 6L))
          q.processAllAvailable()
        } finally q.stop()
        drain()
        assert(GraftMetrics.gaugeValue(GraftMetrics.Scd2AutoWidth).isDefined,
          s"enrich must report its sizing decision, got ${GraftMetrics.snapshot()}")
      } finally spark.listenerManager.unregister(obsListener)
    } finally spark.streams.removeListener(sl)
  }
}
