package graft.streaming

import graft.SparkSpec
import graft.core.Naming
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

class BootstrapSpec extends SparkSpec {

  test("staging cleanup drops only this stream's staging dirs") {
    val wh = Files.createTempDirectory("wh").toString
    val mine = Naming.stagingTable("s1")
    val other = Naming.stagingTable("s2")
    val backfill = Naming.backfillTable("s1", "b1")
    Seq(mine, other, backfill, "unrelated").foreach(n =>
      Files.createDirectories(Paths.get(wh, n)))
    val dropped = Bootstrap.cleanupStagingTables(spark, wh, "s1")
    assert(dropped == Seq(mine))
    assert(Files.exists(Paths.get(wh, other)))
    assert(Files.exists(Paths.get(wh, backfill)))
  }

  test("outdated backfill cleanup keeps the current backfill id") {
    val wh = Files.createTempDirectory("wh2").toString
    val current = Naming.backfillTable("s1", "b2")
    val old = Naming.backfillTable("s1", "b1")
    val oldShard = Naming.shardTable("s1", "b1", 0)
    Seq(current, old, oldShard).foreach(n => Files.createDirectories(Paths.get(wh, n)))
    val dropped = Bootstrap.cleanupOutdatedBackfills(spark, wh, "s1", Some("b2")).sorted
    assert(dropped == Seq(old, oldShard).sorted)
    assert(Files.exists(Paths.get(wh, current)))
  }

  test("createTargetIfMissing commits an empty snapshot with the schema") {
    val dir = Files.createTempDirectory("tgt").toString
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val t = Bootstrap.createTargetIfMissing(spark, dir, schema)
    assert(t.exists)
    assert(t.read().schema.fieldNames.toSeq == Seq("id", "v"))
    assert(t.read().count() == 0)
    // idempotent: second call leaves the version unchanged
    Bootstrap.createTargetIfMissing(spark, dir, schema)
    assert(t.currentVersion.contains(1))
  }

  test("metrics registry counters and streaming listener names") {
    GraftMetrics.reset()
    GraftMetrics.inc(GraftMetrics.RowsIncoming, 42)
    GraftMetrics.inc(GraftMetrics.WatermarkUpdates)
    GraftMetrics.gauge(GraftMetrics.WatermarkAge, 1234)
    val snap = GraftMetrics.snapshot()
    assert(snap("arcane.stream.rows.incoming") == 42)
    assert(snap("arcane.stream.watermark.updates") == 1)
    assert(snap("arcane.stream.watermark.age") == 1234)
  }
}

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("analyze computes rows, null counts, min/max and persists sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("ana").toString
    val t = new ParquetTarget(spark, dir)
    t.commit(Seq((1L, Some("a")), (2L, None), (3L, Some("c"))).toDF("id", "v"))
    val stats = t.analyze()
    assert(stats("rows") == "3")
    assert(stats("nulls:v") == "1")
    assert(stats("min:id") == "1" && stats("max:id") == "3")
    assert(t.readStats().exists(_.contains("\"rows\": \"3\"")))
  }

  test("adaptive trigger sizing: row estimate, cap, partition clamp") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val rowBytes = AdaptiveTrigger.estimateRowBytes(schema, avgStringLen = 100)
    assert(rowBytes == 8 + 8 + 108)
    val cap = AdaptiveTrigger.maxRowsPerTrigger(1L << 30, rowBytes, cutoff = 0.6)
    assert(cap > 0 && cap < (1L << 30))
    assert(AdaptiveTrigger.commitPartitions(32) == 16)
    assert(AdaptiveTrigger.commitPartitions(1) == 1)
  }
}
