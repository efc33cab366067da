package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: for each key, the earliest time each step
  * completed, where every step must happen STRICTLY AFTER the previous
  * step's completion (the standard conversion-funnel semantics — a purchase
  * logged before the first view does not count as a conversion).
  *
  * Shape per step: filter (map-side, pushed to the scan for literal
  * predicates) → min-aggregation on the key → join with the previous
  * step's completions. All joins are on the 8-byte key; every intermediate
  * is ≤ |keys that reached the step| rows, monotonically shrinking down the
  * funnel — no window over raw events, no event-order sort.
  */
object Funnel {

  /** @param steps   (name, predicate) in funnel order; output columns are
    *                `t_<name>` (null = key never reached the step), one row
    *                per key that completed the FIRST step.
    * @param maxGap  optional conversion window: step i counts only when it
    *                happens within `maxGap` of step i−1's time (strictly
    *                after, at most that much later) — the "purchased within
    *                an hour of clicking" form every funnel report wants.
    *                None = unbounded (any later time converts).
    */
  def ordered(events: DataFrame, keyCol: String, tsCol: String,
              steps: Seq[(String, Column)],
              maxGap: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc: DataFrame = null
    var prevName: String = null
    for ((name, pred) <- steps) {
      val base = events.filter(pred)
      val scoped =
        if (acc == null) base
        else {
          val joined = base
            .join(acc.select(col(keyCol), col(s"t_$prevName").as("__prev")), keyCol)
            .filter(col(tsCol) > col("__prev"))
          maxGap.fold(joined)(g => joined.filter(col(tsCol) <= col("__prev") + g))
        }
      val stepTimes = scoped.groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"t_$name"))
      acc = if (acc == null) stepTimes
            else acc.join(stepTimes, Seq(keyCol), "left_outer")
      prevName = name
    }
    acc
  }

  /** Label each key with the deepest step reached (the funnel report's
    * grouping column) — evaluate against [[ordered]]'s output.
    */
  def furthest(steps: Seq[String]): Column =
    steps.foldLeft(lit(steps.head): Column) { (deeper, name) =>
      // each later step wraps OUTSIDE, so the deepest reached step wins
      when(col(s"t_$name").isNotNull, lit(name)).otherwise(deeper)
    }
}
