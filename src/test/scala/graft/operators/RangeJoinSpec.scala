package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private val left = Seq(
    (1L, 100L, "2024-01-01 10:00:00"),
    (2L, 100L, "2024-01-01 10:30:00"),
    (3L, 200L, "2024-01-01 10:00:00")
  ).toDF("lid", "k", "lt").withColumn("lt", to_timestamp($"lt"))

  private val right = Seq(
    (901L, 100L, "2024-01-01 09:59:59"), // 1s before left 1 — inside
    (902L, 100L, "2024-01-01 09:00:01"), // 59m59s before left 1 — outside 30m
    (903L, 100L, "2024-01-01 10:00:00"), // equal to left 1 — excluded (strict <)
    (904L, 100L, "2024-01-01 10:29:00"), // inside left 2's window (and after left 1)
    (905L, 300L, "2024-01-01 10:00:00")  // wrong key
  ).toDF("rid", "k", "rt").withColumn("rt", to_timestamp($"rt"))

  test("pairs exactly the rows in [lt - w, lt), same key, across bin edges") {
    val out = RangeJoin.precedingWindow(left, right, Seq("k"), "lt", "rt", 1800L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 901L), (2L, 903L), (2L, 904L)),
      s"got $out")
  }

  test("plan contains no cartesian or broadcast-nested-loop node") {
    val df = RangeJoin.precedingWindow(left, right, Seq("k"), "lt", "rt", 1800L)
    df.write.format("noop").mode("overwrite").save()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case o => Seq(o)
      }
      self ++ p.children.flatMap(nodes)
    }
    val bad = nodes(df.queryExecution.executedPlan).filter(n =>
      n.isInstanceOf[CartesianProductExec] || n.isInstanceOf[BroadcastNestedLoopJoinExec])
    assert(bad.isEmpty, bad.map(_.nodeName).mkString(", "))
  }

  test("matches the naive inequality join on real events") {
    val ev = eventsNtz()
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"user_id", $"ts".as("error_ts"))
    val ctx = ev.select($"user_id", $"ts", $"event_id".as("ctx_id"))
    val fast = RangeJoin.precedingWindow(errors, ctx, Seq("user_id"),
      "error_ts", "ts", 1800L)
      .select($"error_id", $"ctx_id").as[(Long, Long)].collect().toSet
    val naive = errors.join(ctx, Seq("user_id"))
      .filter($"ts" >= $"error_ts" - expr("INTERVAL 1800 SECONDS") && $"ts" < $"error_ts")
      .select($"error_id", $"ctx_id").as[(Long, Long)].collect().toSet
    assert(fast == naive)
  }
}
