package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the latest right row whose
  * timestamp is <= the left row's, per key — the canonical time-series
  * enrichment (trade→quote, click→view, reading→calibration) that Spark has
  * no built-in operator for.
  *
  * Formulation: union the two sides tagged, sort each key's rows by
  * (ts, side) — right rows first at equal timestamps so "at or before"
  * includes ties — and carry the right payload forward with a running
  * `last(ignoreNulls)` window. Cost is ONE shuffle+sort of |left| + |right|
  * rows keyed by the join key: no range-pair expansion, no per-left-row
  * probe, O(1) window state per row. At 1000 executors each key's timeline
  * sorts locally after the hash exchange — the same plan shape a regular
  * window aggregation gets.
  */
object AsofJoin {

  /** @param carry right columns to attach to each left row (as
    *               `prefix+name`); rows with no prior right match get nulls
    *               (left-asof semantics — filter on the carried column for
    *               inner-asof)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String, carry: Seq[String],
                   prefix: String = "asof_"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val lPayload = left.columns.filterNot(keyCols.contains).toSeq
    val lNorm = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        lPayload.map(col) ++
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rNorm = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        carry.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort before left rows at equal __ts, so an exactly-equal
    // timestamp is visible to the left row; trailing carry columns make the
    // order total when several right rows share (key, ts)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col("__ts"), col("__side")) ++ carry.map(c => col(s"__r_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.foldLeft(rNorm.unionByName(lNorm)) { (df, c) =>
      df.withColumn(s"$prefix$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ carry.map(c => col(s"$prefix$c")): _*)
  }
}
