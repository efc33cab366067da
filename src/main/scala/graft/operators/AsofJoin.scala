package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, the temporally closest right row per key
  * — the canonical time-series enrichment (trade→quote, click→view,
  * reading→calibration) that Spark has no built-in operator for. Three
  * directions, each with an optional tolerance:
  *
  *   - [[asofBackward]]: latest right row with `ts <= left.ts`
  *   - [[asofForward]]:  earliest right row with `ts >= left.ts`
  *   - [[asofNearest]]:  whichever of the two is closer (ties → backward)
  *
  * Formulation: union the two sides tagged, sort each key's rows by
  * (ts, side) — right rows adjacent to left rows at equal timestamps so
  * "at or exactly on" includes ties — and carry the right payload across
  * with a running `last(ignoreNulls)` window (scanned in ascending ts order
  * for backward, descending for forward). Cost is ONE shuffle of
  * |left| + |right| rows keyed by the join key: no range-pair expansion, no
  * per-left-row probe, O(1) window state per row; `asofNearest` reuses the
  * same exchange for both directions (two sorts, one shuffle). At 1000
  * executors each key's timeline sorts locally after the hash exchange —
  * the same plan shape a regular window aggregation gets.
  *
  * Tolerance (`max |left.ts - right.ts|`) nulls out a carried match that is
  * too far away — combined with a not-null filter that is inner-asof-with-
  * tolerance, matching DuckDB's `ASOF JOIN ... WHERE delta <= tol` shape
  * (the backward/forward match, being the closest one, is in-tolerance iff
  * any match is).
  */
object AsofJoin {

  /** @param carry right columns to attach to each left row (as
    *               `prefix+name`); rows with no match (or none within
    *               `tolerance`) get nulls — filter on the carried column
    *               for inner-asof semantics
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String, carry: Seq[String],
                   prefix: String = "asof_",
                   tolerance: Option[Column] = None): DataFrame =
    directed(left, right, keyCols, leftTs, rightTs, carry, prefix,
      forward = false, tolerance)

  /** Earliest right row with `ts >= left.ts` (equal timestamps match). */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String, carry: Seq[String],
                  prefix: String = "asof_",
                  tolerance: Option[Column] = None): DataFrame =
    directed(left, right, keyCols, leftTs, rightTs, carry, prefix,
      forward = true, tolerance)

  // internal name for the carried right timestamp (needed for tolerance and
  // nearest-side selection); never escapes the operator
  private val RtsCol = "__rts"

  /** The right row's payload travels as ONE struct (`__r`), never as
    * independent columns: a per-column `last(ignoreNulls)` would splice a
    * NULL in the matching row's carry column with a value from an OLDER
    * right row — emitting a franken-row that never existed (and, under a
    * tolerance, smuggling an out-of-tolerance value through a row whose
    * `__rts` alone is judged). `last` over the struct is all-or-nothing:
    * the carried match is exactly one real right row, NULL fields included.
    */
  private def normalized(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                         leftTs: String, rightTs: String,
                         carry: Seq[String]): (DataFrame, Seq[String]) = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    val lPayload = left.columns.filterNot(keyCols.contains).toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      carry.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField(
          RtsCol, right.schema(rightTs).dataType))
    val lNorm = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        lPayload.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val rNorm = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carry.map(c => col(c).as(c)) :+ col(rightTs).as(RtsCol): _*).as("__r"): _*)
    (rNorm.unionByName(lNorm), lPayload)
  }

  /** In-tolerance predicate for a carried right timestamp (null-safe: a
    * null carried ts is already "no match").
    */
  private def inTolerance(rts: Column, ts: Column, forward: Boolean,
                          tolerance: Option[Column]): Column =
    tolerance.fold(rts.isNotNull) { tol =>
      if (forward) rts.isNotNull && rts <= ts + tol
      else rts.isNotNull && rts >= ts - tol
    }

  private def directed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String, carry: Seq[String],
                       prefix: String, forward: Boolean,
                       tolerance: Option[Column]): DataFrame = {
    val (unioned, _) =
      normalized(left, right, keyCols, leftTs, rightTs, carry)
    // ascending scan finds the latest right at-or-before each left row;
    // descending finds the earliest right at-or-after. Right rows (side 0)
    // sort before left rows at equal __ts either way, so exact-timestamp
    // matches are visible; the trailing struct makes the order total when
    // several right rows share (key, ts).
    val ts0 = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ts0, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val valid = inTolerance(col("__m").getField(RtsCol), col("__ts"), forward, tolerance)
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        carry.map(c => when(valid, col("__m").getField(c)).as(s"$prefix$c")): _*)
  }

  /** Closest right row in either direction (ties go backward — the match a
    * pure backward join would have produced). One shuffle: both directional
    * windows share the key partitioning, so the forward pass costs a second
    * sort of the same exchange, not a second shuffle.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String, carry: Seq[String],
                  prefix: String = "asof_",
                  tolerance: Option[Column] = None): DataFrame = {
    val (unioned, _) =
      normalized(left, right, keyCols, leftTs, rightTs, carry)
    def win(forward: Boolean) = {
      val ts0 = if (forward) col("__ts").desc else col("__ts").asc
      Window.partitionBy(keyCols.map(col): _*)
        .orderBy(ts0, col("__side").asc, col("__r").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val carried = unioned
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(win(forward = false)))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(win(forward = true)))
    val ts = col("__ts")
    val validB = inTolerance(col("__b").getField(RtsCol), ts, forward = false, tolerance)
    val validF = inTolerance(col("__f").getField(RtsCol), ts, forward = true, tolerance)
    val backCloser =
      (ts - col("__b").getField(RtsCol)) <= (col("__f").getField(RtsCol) - ts)
    val useB = validB && (!validF || backCloser)
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        carry.map(c =>
          when(useB, col("__b").getField(c))
            .otherwise(when(validF, col("__f").getField(c))).as(s"$prefix$c")): _*)
  }
}
