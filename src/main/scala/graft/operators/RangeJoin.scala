package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band/range join on time: pair each left row with the right rows of the
  * same key whose timestamp falls in the window `[leftTs - window, leftTs)`
  * — error-context gathering, feature lookback, sensor alignment.
  *
  * Spark's optimizer turns a raw `r.ts BETWEEN l.ts - w AND l.ts` predicate
  * into a broadcast-nested-loop or cartesian product; this operator makes it
  * an EQUI-join by bucketing both sides into window-sized bins: a right row
  * at or before the left row within `window` lives in the same bin or the
  * one before, so the left side probes exactly two bins. One shuffle on
  * (key, bin), candidate volume ∝ true matches + bin cohabitants, and the
  * exact interval predicate filters the candidates. No non-equi join node
  * anywhere in the plan.
  */
object RangeJoin {

  /** Timestamps must be Spark timestamp/timestamp_ntz columns; `windowSec`
    * is the lookback in seconds. Column names of `left` and `right` must be
    * disjoint apart from `keyCols` (rename before calling).
    */
  def precedingWindow(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTs: String, rightTs: String,
                      windowSec: Long): DataFrame = {
    require(windowSec > 0, "window must be positive")
    // second-granularity bins prefilter; the exact predicate below keeps
    // sub-second semantics
    def bin(ts: String) = floor(unix_timestamp(col(ts)) / windowSec)
    val l = left.withColumn("__bin", explode(array(bin(leftTs) - 1, bin(leftTs))))
    val r = right.withColumn("__bin", bin(rightTs))
    l.join(r, keyCols :+ "__bin")
      .filter(col(rightTs) >= col(leftTs) - expr(s"INTERVAL $windowSec SECONDS") &&
        col(rightTs) < col(leftTs))
      .drop("__bin")
  }
}
