package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("alpha"), 10),
    (2L, Some("beta"), 25),
    (3L, None, 40),
    (4L, Some("gamma"), 999),
    (4L, Some("delta"), 30))
    .toDF("id", "name", "size")

  test("audit emits one row per expectation with correct values and verdicts") {
    val rows = Expectations.audit(df, Seq(
      Expectations.completeness("name"),                      // 4/5 = 0.8 → fail at 1.0
      Expectations.uniqueness("id"),                          // 4/5 = 0.8 → fail
      Expectations.inRange("size", 0, 100, atLeast = 0.6),    // 4/5 = 0.8 → pass
      Expectations.satisfies("short_name", "name",
        length($"name") <= 5, atLeast = 0.5),                 // 4/5 = 0.8 → pass
      Expectations.minOf("size", atLeast = 5.0),              // 10 → pass
      Expectations.maxOf("size", atMost = 100.0)))            // 999 → fail
      .collect()
    assert(rows.length == 6)
    val byMetric = rows.map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(5))).toMap
    assert(byMetric("completeness") == (0.8, false))
    assert(byMetric("uniqueness") == (0.8, false))
    assert(byMetric("in_range") == (0.8, true))
    assert(byMetric("short_name") == (0.8, true))
    assert(byMetric("min") == (10.0, true))
    assert(byMetric("max") == (999.0, false))
    // declaration order is preserved
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("completeness", "uniqueness", "in_range", "short_name", "min", "max"))
  }

  test("N expectations cost one aggregation: the plan has a single Aggregate pair") {
    val audited = Expectations.audit(df, Seq(
      Expectations.completeness("name"),
      Expectations.uniqueness("id"),
      Expectations.inRange("size", 0, 100),
      Expectations.minOf("size", 0.0)))
    val plan = audited.queryExecution.executedPlan.toString
    // one partial + one final aggregate node (uniqueness adds an Expand for
    // the distinct, not another scan); fail if a per-expectation job sneaks in
    assert(plan.split("Scan").length - 1 <= 1, s"more than one scan:\n$plan")
  }

  test("holds gates a batch; approxUniqueness stays within rsd of exact") {
    assert(Expectations.holds(df, Seq(Expectations.inRange("size", 0, 1000))))
    assert(!Expectations.holds(df, Seq(Expectations.completeness("name"))))
    val v = Expectations.audit(df, Seq(Expectations.approxUniqueness("id", atLeast = 0.0)))
      .head().getDouble(2)
    assert(v > 0.5 && v < 1.1, s"approx uniqueness $v implausible for 4/5 distinct")
  }

  test("empty expectation list is rejected") {
    intercept[IllegalArgumentException](Expectations.audit(df, Nil))
  }
}
