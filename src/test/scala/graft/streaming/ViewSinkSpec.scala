package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, IncrementalAgg, MsSqlCtDialect}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ViewSinkSpec extends SparkSpec {
  import spark.implicits._

  private val batches = Seq(
    Seq(("k1", 1L, "a", 10.0, "U"), ("k2", 1L, "a", 20.0, "U"),
      ("k3", 2L, "b", 30.0, "U")),
    Seq(("k1", 3L, "b", 15.0, "U"), ("k4", 4L, "b", 40.0, "U")),
    Seq(("k3", 5L, "b", 0.0, "D"), ("k2", 6L, "a", 25.0, "U"),
      ("k5", 7L, "a", 50.0, "U")))

  private def df(rows: Seq[(String, Long, String, Double, String)]): DataFrame =
    rows.toDF("k", "SYS_CHANGE_VERSION", "g", "v", "SYS_CHANGE_OPERATION")

  private def collect(d: DataFrame): Seq[(String, Long, Double)] =
    d.select($"g", $"cnt".cast("long"), round($"sum_value", 6))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

  test("micro-batched view always equals a bootstrap of the committed state") {
    val viewT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_v").toString)
    val stateT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_s").toString)
    batches.foreach { b =>
      ViewSink.processBatch(viewT, stateT, df(b), "k", MsSqlCtDialect, Seq("g"), "v")
      // after EVERY batch, the maintained view must match recomputing from
      // the state it ships with
      val recomputed = collect(IncrementalAgg.bootstrap(stateT.read(), Seq("g"), "v"))
      assert(collect(viewT.read()) == recomputed)
    }
    // and the final state matches one-shot dedup+tombstone over the feed
    val full = Dedup.latestByKey(df(batches.flatten), col("k"),
      Seq(col("SYS_CHANGE_VERSION")))
      .filter(col("SYS_CHANGE_OPERATION") =!= "D")
    assert(collect(viewT.read()) ==
      collect(IncrementalAgg.bootstrap(full, Seq("g"), "v")))
  }

  test("re-delivered batch converges (at-least-once replay)") {
    val viewT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_rd_v").toString)
    val stateT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_rd_s").toString)
    batches.foreach(b => ViewSink.processBatch(viewT, stateT, df(b), "k",
      MsSqlCtDialect, Seq("g"), "v"))
    val before = collect(viewT.read())
    ViewSink.processBatch(viewT, stateT, df(batches.last), "k",
      MsSqlCtDialect, Seq("g"), "v")
    assert(collect(viewT.read()) == before)
  }

  test("crash between commits recovers: stranded view rebuilds from the state") {
    import graft.operators.CdcMerge
    val viewT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_cr_v").toString)
    val stateT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_cr_s").toString)
    ViewSink.processBatch(viewT, stateT, df(batches.head), "k",
      MsSqlCtDialect, Seq("g"), "v")
    // simulate the crash window: batch 2 advanced the STATE but died
    // before the view commit (incl. a group-vacating move of k1: a -> b)
    val latest2 = Dedup.latestByKey(df(batches(1)), col("k"),
      Seq(col("SYS_CHANGE_VERSION")))
    stateT.commit(CdcMerge.applyChanges(stateT.read(), latest2, "k", MsSqlCtDialect))
    assert(viewT.currentVersion != stateT.currentVersion, "fixture: versions out of step")
    // next batch detects the mismatch, rebuilds, then folds incrementally
    ViewSink.processBatch(viewT, stateT, df(batches(2)), "k",
      MsSqlCtDialect, Seq("g"), "v")
    val recomputed = collect(IncrementalAgg.bootstrap(stateT.read(), Seq("g"), "v"))
    assert(collect(viewT.read()) == recomputed)
    assert(viewT.currentVersion == stateT.currentVersion, "lockstep restored")
  }

  test("empty batches commit nothing") {
    val viewT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_ev").toString)
    val stateT = new ParquetTarget(spark, Files.createTempDirectory("viewsink_es").toString)
    ViewSink.processBatch(viewT, stateT, df(batches.head), "k", MsSqlCtDialect, Seq("g"), "v")
    val (vv, sv) = (viewT.currentVersion, stateT.currentVersion)
    ViewSink.processBatch(viewT, stateT, df(batches.head).limit(0), "k",
      MsSqlCtDialect, Seq("g"), "v")
    assert(viewT.currentVersion == vv && stateT.currentVersion == sv)
  }
}
