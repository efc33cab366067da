package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * day-2 monitoring twin of [[graft.operators.SnapshotDiff]] (which answers
  * "WHICH rows changed"; this answers "did the DISTRIBUTION move").
  *
  * The metric is the population stability index,
  *
  *   PSI = Σ_buckets (p_b − q_b) · ln(p_b / q_b),
  *
  * with Laplace-smoothed proportions p_b = (n_b + 0.5) / (N + 0.5·K) so
  * empty buckets on either side stay finite and the number is deterministic
  * (no epsilon clamps). Conventional reading: < 0.1 stable, 0.1–0.25
  * moderate shift, > 0.25 investigate.
  *
  * Scale: bucket assignment is a map-side expression; each side collapses to
  * ≤ K bucket-count rows (K fixed by the caller's edges or the categorical
  * domain) BEFORE the two sides meet, so the join and the window total run
  * over O(K) rows no matter how many trillions of input rows — the same
  * bounded-agg posture as the mixture samplers.
  */
object Drift {

  /** Bucket index for a numeric value against fixed ascending edges:
    * #edges ≤ value, i.e. 0 for v < edges(0), edges.size for v ≥ last.
    * NULL values get bucket -1 (their own bucket, drift-tracked too).
    */
  def bucketOf(value: Column, edges: Seq[Double]): Column = {
    require(edges.nonEmpty && edges == edges.sorted, "edges must be ascending")
    val idx = edges.map(e => when(value >= lit(e), 1).otherwise(0))
      .reduce(_ + _)
    when(value.isNull, lit(-1)).otherwise(idx).cast("long")
  }

  private def smoothedPsi(refC: DataFrame, curC: DataFrame, k: Int): DataFrame = {
    // full-outer on the bounded bucket keys; absent buckets count 0
    val joined = refC.withColumnRenamed("n", "ref_n")
      .join(curC.withColumnRenamed("n", "cur_n"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val w = Window.partitionBy() // O(K) rows: totals over the bucket frame
    // K honors the documented "+1 for the null bucket WHEN PRESENT": the
    // caller's k counts the fixed edge bins only, so when bucket −1 shows
    // up the smoothing mass must grow with it or the proportions stop
    // summing to 1 and PSI is biased for every null-bearing column
    val kCol = lit(k) +
      max(when(col("bucket") === -1L, 1).otherwise(0)).over(w)
    val p = (col("ref_n") + lit(0.5)) / (sum(col("ref_n")).over(w) + lit(0.5) * kCol)
    val q = (col("cur_n") + lit(0.5)) / (sum(col("cur_n")).over(w) + lit(0.5) * kCol)
    joined
      .withColumn("__term", (p - q) * log(p / q))
      .withColumn("psi_term", round(col("__term"), 6) + lit(0.0))
      .withColumn("psi_total", round(sum(col("__term")).over(w), 4) + lit(0.0))
      .drop("__term")
  }

  /** Numeric-feature PSI between `ref` and `cur` over fixed bucket edges.
    * Output: one row per occupied-or-edge bucket with both counts, the
    * bucket's (rounded) PSI contribution, and the total PSI repeated on
    * every row. K = edges.size + 1 (+1 for the null bucket when present).
    */
  def psiNumeric(ref: DataFrame, cur: DataFrame, feature: Column,
                 edges: Seq[Double]): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.groupBy(bucketOf(feature, edges).as("bucket"))
        .agg(count(lit(1)).as("n"))
    smoothedPsi(counts(ref), counts(cur), edges.size + 1)
  }

  /** Frozen reference histogram: K bucket counts + a total — the whole
    * model is ≤ edges.size + 2 numbers on the driver, the same frozen-model
    * device as the DSIR / PQ / BM25 streaming twins.
    */
  final case class FrozenHistogram(edges: Seq[Double], counts: Map[Long, Long]) {
    def total: Long = counts.valuesIterator.sum
    def k: Int = edges.size + 1
  }

  /** Collect the reference side ONCE (one bounded agg; ≤K rows reach the
    * driver). Use with [[psiAgainstFrozen]] to monitor a stream of arriving
    * batches against a standing reference without rescanning it.
    */
  def freezeNumeric(ref: DataFrame, feature: Column, edges: Seq[Double]): FrozenHistogram = {
    val rows = ref.groupBy(bucketOf(feature, edges).as("bucket"))
      .agg(count(lit(1)).as("n")).collect()
    FrozenHistogram(edges, rows.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  /** PSI of `cur` against a frozen reference — identical output (same
    * buckets, same smoothing, same rounding) to [[psiNumeric]] run against
    * the original reference frame, pinned in `DriftSpec`. The reference
    * side is a literal K-row local relation, so per batch the only work is
    * the current side's map-side bucket count.
    */
  def psiAgainstFrozen(cur: DataFrame, feature: Column, frozen: FrozenHistogram): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    val refC = frozen.counts.toSeq.toDF("bucket", "n")
    val curC = cur.groupBy(bucketOf(feature, frozen.edges).as("bucket"))
      .agg(count(lit(1)).as("n"))
    smoothedPsi(refC, curC, frozen.edges.size + 1)
  }

  /** Categorical-feature PSI: buckets are the observed category values
    * (NULL → its own bucket). K is the union domain size, computed from the
    * bounded bucket frames themselves — callers use this for low-cardinality
    * columns (language, source, license); high-cardinality keys belong in
    * [[psiNumeric]] via a hash-bucket feature.
    */
  def psiCategorical(ref: DataFrame, cur: DataFrame, feature: Column): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.groupBy(coalesce(feature.cast("string"), lit("__null__")).as("bucket"))
        .agg(count(lit(1)).as("n"))
    val refC = counts(ref)
    val curC = counts(cur)
    // K = |union domain|: a second bounded agg over the ≤K-row frames
    val joined = refC.withColumnRenamed("n", "ref_n")
      .join(curC.withColumnRenamed("n", "cur_n"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val w = Window.partitionBy()
    val k = count(lit(1)).over(w)
    val p = (col("ref_n") + lit(0.5)) / (sum(col("ref_n")).over(w) + lit(0.5) * k)
    val q = (col("cur_n") + lit(0.5)) / (sum(col("cur_n")).over(w) + lit(0.5) * k)
    joined
      .withColumn("__term", (p - q) * log(p / q))
      .withColumn("psi_term", round(col("__term"), 6) + lit(0.0))
      .withColumn("psi_total", round(sum(col("__term")).over(w), 4) + lit(0.0))
      .drop("__term")
  }
}
