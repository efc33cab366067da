package graft.streaming

import graft.SparkSpec
import graft.operators.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

final case class Scd2Change(k: String, v: Long, state: String, del: Boolean)

class Scd2SinkSpec extends SparkSpec {
  import spark.implicits._

  private val feed = Seq(
    // batch 1
    Seq(Scd2Change("k1", 1L, "a", del = false), Scd2Change("k2", 1L, "x", del = false),
      Scd2Change("k1", 2L, "a", del = false)),
    // batch 2: transition, delete, new key
    Seq(Scd2Change("k1", 3L, "b", del = false), Scd2Change("k2", 4L, "x", del = true),
      Scd2Change("k3", 4L, "m", del = false)),
    // batch 3: re-insert after delete, untouched k3
    Seq(Scd2Change("k2", 7L, "y", del = false), Scd2Change("k1", 8L, "b", del = false)))

  private def collected(df: DataFrame): Seq[(String, String, Long, Option[Long], Boolean)] =
    df.select($"k", $"state", $"valid_from", $"valid_to", $"is_current")
      .as[(String, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  private def expected: Seq[(String, String, Long, Option[Long], Boolean)] =
    collected(Scd2.buildHistory(feed.flatten.toDF(), "k", "v", Seq("state"), $"del"))

  test("micro-batched history equals one batch build over the whole feed") {
    implicit val sqlCtx = spark.sqlContext
    val target = new ParquetTarget(spark,
      Files.createTempDirectory("scd2sink").toString)
    val input = MemoryStream[Scd2Change]
    val q = input.toDS().toDF().writeStream
      .foreachBatch(Scd2Sink.foreachBatchFn(target, "k", "v", Seq("state"), col("del")))
      .option("checkpointLocation", Files.createTempDirectory("scd2ck").toString)
      .start()
    try {
      feed.foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
      assert(collected(target.read()) == expected)
    } finally q.stop()
  }

  test("replaying a batch against the target is a no-op (checkpoint recovery)") {
    val target = new ParquetTarget(spark,
      Files.createTempDirectory("scd2replay").toString)
    feed.foreach(b => Scd2Sink.processBatch(target, b.toDF(), "k", "v",
      Seq("state"), col("del")))
    val before = collected(target.read())
    Scd2Sink.processBatch(target, feed.last.toDF(), "k", "v", Seq("state"), col("del"))
    assert(collected(target.read()) == before)
  }

  test("streaming facts enrich against the maintained history (temporal join per batch)") {
    // the composition a real deployment runs: dimension changes maintain
    // the history via the sink, and each FACT batch temporal-joins the
    // history as of its own version
    val target = new ParquetTarget(spark,
      Files.createTempDirectory("scd2enrich").toString)
    feed.foreach(b => Scd2Sink.processBatch(target, b.toDF(), "k", "v",
      Seq("state"), col("del")))
    val facts = Seq(
      ("k1", 2L), ("k1", 5L), ("k1", 9L),
      ("k2", 5L), ("k2", 8L),
      ("k3", 6L)
    ).toDF("k", "fv")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"fv", $"state").as[(String, Long, String)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val out = sorted(Scd2.asOfJoin(facts, target.read(), "k", col("fv")))
    // history from the feed: k1 a:[1,3) b:[3,∞); k2 x:[1,4) deleted, y:[7,∞); k3 m:[4,∞)
    assert(out == Seq(
      ("k1", 2L, "a"), ("k1", 5L, "b"), ("k1", 9L, "b"),
      ("k2", 8L, "y"), ("k3", 6L, "m")),
      s"got $out") // k2@5 falls in the deletion gap [4,7) and drops
    // the composition's default enrich path (auto-width bucketed join)
    // must be row-for-row identical to the plain as-of join
    assert(sorted(Scd2Sink.enrich(target, facts, "k", col("fv"))) == out)
  }

  test("empty batches do not commit a new snapshot") {
    val target = new ParquetTarget(spark,
      Files.createTempDirectory("scd2empty").toString)
    Scd2Sink.processBatch(target, feed.head.toDF(), "k", "v", Seq("state"), col("del"))
    val ver = target.currentVersion
    Scd2Sink.processBatch(target, feed.head.toDF().limit(0), "k", "v",
      Seq("state"), col("del"))
    assert(target.currentVersion == ver)
  }
}
