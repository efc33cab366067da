package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class IncrementalAggSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  // change feed: (key, version, group, value, op)
  private val feed = Seq(
    ("k1", 1L, "a", 10.0, "U"), ("k2", 1L, "a", 20.0, "U"),
    ("k3", 2L, "b", 30.0, "U"), ("k4", 2L, "b", 40.0, "U"),
    ("k1", 3L, "b", 15.0, "U"),  // k1 moves group a -> b
    ("k2", 4L, "a", 25.0, "U"),  // value update in place
    ("k3", 5L, "b", 0.0, "D"),   // delete
    ("k5", 6L, "a", 50.0, "U"),  // insert
    ("k1", 7L, "a", 12.0, "U"))  // k1 moves back

  private def df(rows: Seq[(String, Long, String, Double, String)]): DataFrame =
    rows.toDF("k", "SYS_CHANGE_VERSION", "g", "v", "SYS_CHANGE_OPERATION")

  private def mergedState(rows: Seq[(String, Long, String, Double, String)]): DataFrame = {
    val latest = Dedup.latestByKey(df(rows), col("k"), Seq(col("SYS_CHANGE_VERSION")))
    latest.filter(col("SYS_CHANGE_OPERATION") =!= "D")
  }

  private def viewOf(state: DataFrame): Seq[(String, Long, Double)] =
    IncrementalAgg.bootstrap(state, Seq("g"), "v")
      .select($"g", $"cnt", round($"sum_value", 6))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

  test("maintained view equals full recompute at every split point") {
    forAll(Table("split", 1L, 2L, 4L, 6L)) { split =>
      val (pre, post) = feed.partition(_._2 <= split)
      val target = mergedState(pre).drop("SYS_CHANGE_OPERATION")
      val latest = Dedup.latestByKey(df(post), col("k"), Seq(col("SYS_CHANGE_VERSION")))
      val view0 = IncrementalAgg.bootstrap(target, Seq("g"), "v")
      val maintained = IncrementalAgg.maintain(view0, target, latest, "k",
        MsSqlCtDialect, Seq("g"), "v")
        .select($"g", $"cnt", round($"sum_value", 6))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
      val expected = viewOf(mergedState(feed))
      assert(maintained == expected, s"split at $split")
    }
  }

  test("min/max maintenance by group recompute equals full recompute at every split") {
    val aggs = Seq(
      "min_v" -> min(col("v")), "max_v" -> max(col("v")),
      "cnt" -> count(lit(1)))
    def fullView(state: DataFrame): Seq[(String, Double, Double, Long)] =
      state.groupBy($"g").agg(aggs.head._2.as("min_v"), aggs(1)._2.as("max_v"),
        aggs(2)._2.as("cnt"))
        .as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
    forAll(Table("split", 1L, 3L, 5L)) { split =>
      val (pre, post) = feed.partition(_._2 <= split)
      val target = mergedState(pre).drop("SYS_CHANGE_OPERATION")
      val latest = Dedup.latestByKey(df(post), col("k"), Seq(col("SYS_CHANGE_VERSION")))
      val view0 = target.groupBy($"g").agg(aggs.head._2.as("min_v"),
        aggs(1)._2.as("max_v"), aggs(2)._2.as("cnt"))
      val out = IncrementalAgg.maintainByGroupRecompute(view0, target, latest,
        "k", MsSqlCtDialect, Seq("g"), aggs)
        .as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
      assert(out == fullView(mergedState(feed)), s"split at $split")
    }
  }

  test("NULL group values are a real group: recomputed and never stranded") {
    // k1 sits in the NULL group; the batch updates it — a null-unsafe
    // membership join would both miss the recompute AND keep the stale row
    val target = Seq((Some("k1"), 1L, None: Option[String], 5.0),
      (Some("k2"), 1L, Some("b"), 7.0))
      .toDF("k", "SYS_CHANGE_VERSION", "g", "v")
    val latest = Seq((Some("k1"), 2L, None: Option[String], 9.0, "U"))
      .toDF("k", "SYS_CHANGE_VERSION", "g", "v", "SYS_CHANGE_OPERATION")
    val view0 = target.groupBy($"g").agg(min($"v").as("min_v"),
      max($"v").as("max_v"), count(lit(1)).as("cnt"))
    val out = IncrementalAgg.maintainByGroupRecompute(view0, target, latest,
      "k", MsSqlCtDialect, Seq("g"),
      Seq("min_v" -> min(col("v")), "max_v" -> max(col("v")), "cnt" -> count(lit(1))))
      .select($"g", $"min_v", $"max_v", $"cnt")
      .as[(Option[String], Double, Double, Long)].collect()
      .sortBy(_._1.getOrElse("")).toSeq
    assert(out == Seq((None, 9.0, 9.0, 1L), (Some("b"), 7.0, 7.0, 1L)))
  }

  test("untouched groups pass through from the OLD view, not a recompute") {
    // two groups; the batch touches only group 'b' — poison group 'a''s
    // view row and assert the poison survives (proof of the pass-through)
    val target = Seq(("k1", 1L, "a", 5.0), ("k2", 1L, "b", 7.0))
      .toDF("k", "SYS_CHANGE_VERSION", "g", "v")
    val latest = df(Seq(("k2", 2L, "b", 9.0, "U")))
    val poisoned = Seq(("a", -999.0, -999.0, 42L), ("b", 7.0, 7.0, 1L))
      .toDF("g", "min_v", "max_v", "cnt")
    val out = IncrementalAgg.maintainByGroupRecompute(poisoned, target, latest,
      "k", MsSqlCtDialect, Seq("g"),
      Seq("min_v" -> min(col("v")), "max_v" -> max(col("v")), "cnt" -> count(lit(1))))
      .as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", -999.0, -999.0, 42L), ("b", 9.0, 9.0, 1L)),
      "group a must carry the old view row verbatim; group b must recompute")
  }

  test("a group emptied by the batch disappears from the view") {
    val target = Seq(("k1", 1L, "only", 5.0)).toDF("k", "SYS_CHANGE_VERSION", "g", "v")
    val batch = Seq(("k1", 2L, "only", 0.0, "D"))
    val latest = df(batch)
    val view0 = IncrementalAgg.bootstrap(target, Seq("g"), "v")
    val out = IncrementalAgg.maintain(view0, target, latest, "k", MsSqlCtDialect,
      Seq("g"), "v").collect()
    assert(out.isEmpty, "cnt=0 groups must drop, not linger as zero rows")
  }

  test("stale batch versions leave the view untouched") {
    val target = Seq(("k1", 9L, "a", 5.0)).toDF("k", "SYS_CHANGE_VERSION", "g", "v")
    val latest = df(Seq(("k1", 3L, "b", 99.0, "U"))) // stale: 3 < 9
    val view0 = IncrementalAgg.bootstrap(target, Seq("g"), "v")
    val out = IncrementalAgg.maintain(view0, target, latest, "k", MsSqlCtDialect,
      Seq("g"), "v")
      .select($"g", $"cnt", $"sum_value").as[(String, Long, Double)]
      .collect().toSeq
    assert(out == Seq(("a", 1L, 5.0)))
  }
}
