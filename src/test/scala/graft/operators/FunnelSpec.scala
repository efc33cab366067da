package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, type)
  private val events = Seq(
    // u1: full ordered funnel
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    // u2: purchase BEFORE click — must stop at click
    (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
    // u3: click before view — click must not count; stops at view
    (3L, 20L, "view"), (3L, 10L, "click"),
    // u4: never viewed — absent from the funnel entirely
    (4L, 10L, "click"), (4L, 20L, "purchase"),
    // u5: two views; earliest counts; click after the FIRST view counts
    (5L, 10L, "view"), (5L, 50L, "view"), (5L, 15L, "click")
  ).toDF("user_id", "ts", "event_type")

  private val steps = Seq(
    "view" -> (col("event_type") === "view"),
    "click" -> (col("event_type") === "click"),
    "purchase" -> (col("event_type") === "purchase"))

  test("steps count only when strictly after the previous step") {
    val out = Funnel.ordered(events, "user_id", "ts", steps)
      .withColumn("furthest", Funnel.furthest(steps.map(_._1)))
      .select($"user_id", $"t_view", $"t_click", $"t_purchase", $"furthest")
      .as[(Long, Long, Option[Long], Option[Long], String)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 10L, Some(20L), Some(30L), "purchase"),
      (2L, 10L, Some(30L), None, "click"),   // purchase@20 < click@30: no conversion
      (3L, 20L, None, None, "view"),         // click@10 predates the view
      (5L, 10L, Some(15L), None, "click")))  // earliest view anchors the funnel
    assert(!out.exists(_._1 == 4L), "keys that never complete step 1 are absent")
  }

  test("maxGap bounds each conversion window; the slow click drops out") {
    val out = Funnel.ordered(events, "user_id", "ts", steps,
      maxGap = Some(org.apache.spark.sql.functions.lit(15L)))
      .withColumn("furthest", Funnel.furthest(steps.map(_._1)))
      .select($"user_id", $"furthest").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // u2's click at 30 is 20 past its view at 10 — outside the 15-tick
    // window, so u2 stops at view; u1 (gaps of 10) fully converts and
    // u5 (gap 5) reaches click
    assert(out == Seq((1L, "purchase"), (2L, "view"), (3L, "view"), (5L, "click")))
  }
}
