package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/Great-Expectations shape,
  * re-derived from the public papers: Schelter et al. 2018, "Automating
  * Large-Scale Data Quality Verification"): declare expectations over a
  * frame, get back one audit row per expectation —
  * `(metric, column, value, threshold, pass)` — computed in a single
  * aggregation pass.
  *
  * The scale posture IS the point: every metric is an algebraic aggregate
  * (count / sum of indicator columns), so N expectations cost ONE scan +
  * ONE 1-row aggregation — no per-expectation job, no shuffle of data
  * rows. `uniqueness` uses exact `count_distinct` (one extra expand in
  * the same aggregate); at 100 TB swap `approxUniqueness` in — same audit
  * row, HLL-sketch state.
  *
  * A training-data pipeline runs this as the admission gate in front of
  * every ingest batch: completeness of text/id columns, id uniqueness,
  * length ranges, accepted-language fraction.
  */
object Expectations {

  /** One declared expectation: a named metric column (must aggregate to
    * DOUBLE over the input frame), the column label for the audit row, and
    * the inclusive [lo, hi] band the value must land in.
    */
  final case class Expectation(metric: String, column: String, agg: Column,
                               lo: Double, hi: Double)

  /** Fraction of non-null rows. */
  def completeness(column: String, atLeast: Double = 1.0): Expectation =
    Expectation("completeness", column,
      avg(when(col(column).isNotNull, 1.0).otherwise(0.0)),
      atLeast, 1.0)

  /** Distinct values / rows (1.0 = key column). Exact count_distinct. */
  def uniqueness(column: String, atLeast: Double = 1.0): Expectation =
    Expectation("uniqueness", column,
      count_distinct(col(column)).cast("double") / count(lit(1)),
      atLeast, 1.0)

  /** approx_count_distinct twin for corpus-scale audits (same audit row;
    * bounded sketch state instead of an exact distinct expand).
    */
  def approxUniqueness(column: String, atLeast: Double = 1.0,
                       rsd: Double = 0.05): Expectation =
    Expectation("approx_uniqueness", column,
      approx_count_distinct(col(column), rsd).cast("double") / count(lit(1)),
      atLeast, Double.MaxValue)

  /** Fraction of rows whose value lies in [lo, hi] (nulls fail). */
  def inRange(column: String, lo: Double, hi: Double,
              atLeast: Double = 1.0): Expectation =
    Expectation("in_range", column,
      avg(when(col(column).between(lo, hi), 1.0).otherwise(0.0)),
      atLeast, 1.0)

  /** Fraction of rows satisfying an arbitrary predicate (nulls fail). */
  def satisfies(name: String, column: String, predicate: Column,
                atLeast: Double = 1.0): Expectation =
    Expectation(name, column,
      avg(when(predicate, 1.0).otherwise(0.0)),
      atLeast, 1.0)

  /** Minimum value of a numeric column. */
  def minOf(column: String, atLeast: Double): Expectation =
    Expectation("min", column, min(col(column)).cast("double"),
      atLeast, Double.MaxValue)

  /** Maximum value of a numeric column. */
  def maxOf(column: String, atMost: Double): Expectation =
    Expectation("max", column, max(col(column)).cast("double"),
      -Double.MaxValue, atMost)

  /** Run all expectations in ONE aggregation pass. Returns
    * `(metric, col_name, value, lo, hi, pass)`, one row per expectation, in
    * declaration order. Values are rounded to 6 decimals so the audit is
    * engine-replayable.
    */
  def audit(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "audit needs at least one expectation")
    val aggs = expectations.zipWithIndex.map { case (e, i) =>
      (round(e.agg, 6) + lit(0.0)).as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      struct(
        lit(e.metric).as("metric"), lit(e.column).as("col_name"),
        col(s"__m$i").as("value"),
        lit(e.lo).as("lo"), lit(e.hi).as("hi"),
        (col(s"__m$i") >= e.lo && col(s"__m$i") <= e.hi).as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** True iff every expectation passes (drives a fail-the-batch gate). */
  def holds(df: DataFrame, expectations: Seq[Expectation]): Boolean =
    audit(df, expectations).agg(min(when(col("pass"), 1).otherwise(0)))
      .head().getInt(0) == 1
}
