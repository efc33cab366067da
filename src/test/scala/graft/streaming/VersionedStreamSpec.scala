package graft.streaming

import graft.SparkSpec
import graft.operators.{CdcMerge, Dedup, MsSqlCtDialect}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Deterministic feed: version v carries row key "k{v%3}" payload "p{v}";
  * version 5 is a delete of k1. Top-level class: partition objects serialize
  * the source to executors, so it must not capture the test suite.
  */
class TestFeed(capVersion: Long = Long.MaxValue) extends VersionedChangeSource {
  @volatile var version: Long = 0L
  override def currentVersion(): Long = version
  override def fetchChanges(from: Long, to: Long, shard: Int, numShards: Int): Iterator[Row] =
    ((from + 1) to math.min(to, capVersion)).iterator
      .filter(v => (v % numShards) == shard)
      .map { v =>
        val op = if (v == 5) "D" else "U"
        val key = if (v == 5) "k1" else s"k${v % 3}"
        Row(key, v, op, s"p$v")
      }
}

/** [[TestFeed]] whose driver-side version poll fails transiently: every
  * third `currentVersion()` call throws IOException — the
  * deadlock/connection-reset shape the retry policy exists for. Top-level
  * for the same serialization reason as [[TestFeed]].
  */
class FlakyTestFeed extends TestFeed {
  val polls = new java.util.concurrent.atomic.AtomicLong(0L)
  val failures = new java.util.concurrent.atomic.AtomicLong(0L)
  override def currentVersion(): Long = {
    if (polls.incrementAndGet() % 3 == 0) {
      failures.incrementAndGet()
      throw new java.io.IOException("transient: connection reset by test")
    }
    super.currentVersion()
  }
}

/** In-memory versioned change feed driving the custom MicroBatchStream:
  * the full reference loop — poll version, pull sharded changeset, dedup,
  * version-guarded merge in foreachBatch — under Spark's checkpointed
  * streaming engine.
  */
class VersionedStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ARCANE_MERGE_KEY", StringType),
    StructField("SYS_CHANGE_VERSION", LongType),
    StructField("SYS_CHANGE_OPERATION", StringType),
    StructField("payload", StringType)))

  test("versioned micro-batch stream: poll → shard fan-out → merge, checkpointed") {
    val feed = new TestFeed
    VersionedStreamRegistry.register("test-feed", feed)
    val tgtDir = Files.createTempDirectory("vtgt").toString
    val ckpt = Files.createTempDirectory("vckpt").toString
    val target = new ParquetTarget(spark, tgtDir)

    val stream = spark.readStream
      .format(classOf[VersionedStreamProvider].getName)
      .option("source.name", "test-feed")
      .option("source.shards", "2")
      .schema(schema)
      .load()

    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val latest = Dedup.latestByKey(batch, col("ARCANE_MERGE_KEY"),
            Seq(col("SYS_CHANGE_VERSION")))
          val current = target.read(Some(latest.schema))
          val merged = CdcMerge.applyChanges(current, latest, "ARCANE_MERGE_KEY", MsSqlCtDialect)
          target.commit(merged)
        }
        ()
      }
      .start()

    try {
      feed.version = 4 // versions 1..4: k1=p4 (v1,v4), k2=p2, k0=p3
      q.processAllAvailable()
      val afterFirst = target.read().select("ARCANE_MERGE_KEY", "payload")
        .as[(String, String)].collect().toMap
      assert(afterFirst == Map("k1" -> "p4", "k2" -> "p2", "k0" -> "p3"))

      feed.version = 7 // v5 deletes k1, v6→k0=p6, v7→k1=p7 (re-insert after delete)
      q.processAllAvailable()
      val afterSecond = target.read().select("ARCANE_MERGE_KEY", "payload")
        .as[(String, String)].collect().toMap
      // v5 delete and v7 re-insert are in the SAME batch: dedup-latest keeps
      // v7 (the newest change per key), so k1 survives as p7
      assert(afterSecond == Map("k1" -> "p7", "k2" -> "p2", "k0" -> "p6"))
    } finally q.stop()
  }

  test("admission cap: a backlog of M versions is consumed over ceil(M/N) micro-batches") {
    val feed = new TestFeed
    VersionedStreamRegistry.register("test-feed-cap", feed)
    val batchSizes = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val stream = spark.readStream
      .format(classOf[VersionedStreamProvider].getName)
      .option("source.name", "test-feed-cap")
      .option("source.shards", "2")
      .option("source.maxVersionsPerTrigger", "3")
      .schema(schema)
      .load()
    val q = stream.writeStream
      .option("checkpointLocation", Files.createTempDirectory("vckpt3").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) batchSizes.add(n)
        ()
      }
      .start()
    try {
      feed.version = 10 // backlog of 10 versions, cap 3 → 4 batches: 3,3,3,1
      q.processAllAvailable()
      val sizes = batchSizes.asScala.toList
      assert(sizes.sum == 10, s"every backlog version consumed exactly once: $sizes")
      assert(sizes.length == 4, s"ceil(10/3)=4 bounded micro-batches, got: $sizes")
      assert(sizes.forall(_ <= 3), s"no batch may exceed the cap: $sizes")
    } finally q.stop()
  }

  test("backlog >> cap: memory-bounded batches, exact consumption, transient poll failures survived") {
    // the cap comes from the memory model, not a magic number: a budget of
    // ~500 KB at this schema's estimated row size admits ~1100 versions per
    // trigger, so a 25k-version backlog must arrive as ceil(25000/cap)
    // batches each bounded by cap rows (= cap × rowBytes ≤ budget/2 bytes)
    val rowBytes = AdaptiveTrigger.estimateRowBytes(schema)
    val budgetBytes = 500L * 1024
    val cap = AdaptiveTrigger.maxRowsPerTrigger(budgetBytes, rowBytes)
    assert(cap > 100 && cap < 25000, s"test precondition: cap=$cap")

    val feed = new FlakyTestFeed
    VersionedStreamRegistry.register("test-feed-backlog", feed)
    val batchSizes = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val stream = spark.readStream
      .format(classOf[VersionedStreamProvider].getName)
      .option("source.name", "test-feed-backlog")
      .option("source.shards", "4")
      .option("source.maxVersionsPerTrigger", cap.toString)
      .schema(schema)
      .load()
    val q = stream.writeStream
      .option("checkpointLocation", Files.createTempDirectory("vckpt-backlog").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) batchSizes.add(n)
        ()
      }
      .start()
    try {
      val backlog = 25000L
      feed.version = backlog // resume-after-downtime: the whole backlog at once
      q.processAllAvailable()
      val sizes = batchSizes.asScala.toList
      assert(sizes.sum == backlog, s"every version exactly once: sum=${sizes.sum}")
      assert(sizes.length == ((backlog + cap - 1) / cap).toInt,
        s"ceil(backlog/cap) bounded micro-batches, got ${sizes.length} of sizes $sizes")
      assert(sizes.forall(_ <= cap), s"no batch may exceed the admission cap: ${sizes.max}")
      assert(sizes.max * rowBytes <= budgetBytes / 2,
        "peak batch bytes stay inside the memory budget with copy headroom")
      assert(feed.failures.get() > 0,
        "test must actually have injected transient poll failures")
    } finally q.stop()
  }

  test("delete as the latest change in a batch removes the key") {
    val feed = new TestFeed(capVersion = 5) // version 5 (delete of k1) is last
    VersionedStreamRegistry.register("test-feed-2", feed)
    val target = new ParquetTarget(spark, Files.createTempDirectory("vtgt2").toString)
    val stream = spark.readStream
      .format(classOf[VersionedStreamProvider].getName)
      .option("source.name", "test-feed-2")
      .option("source.shards", "3")
      .schema(schema)
      .load()
    val q = stream.writeStream
      .option("checkpointLocation", Files.createTempDirectory("vckpt2").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val latest = Dedup.latestByKey(batch, col("ARCANE_MERGE_KEY"),
            Seq(col("SYS_CHANGE_VERSION")))
          val current = target.read(Some(latest.schema))
          target.commit(CdcMerge.applyChanges(current, latest, "ARCANE_MERGE_KEY", MsSqlCtDialect))
        }
        ()
      }
      .start()
    try {
      feed.version = 7 // fetch capped at 5 → delete of k1 is last
      q.processAllAvailable()
      val keys = target.read().select("ARCANE_MERGE_KEY").as[String].collect().toSet
      assert(keys == Set("k2", "k0")) // k1 deleted
    } finally q.stop()
  }
}
