package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped-aggregate materialized view over a
  * CDC merge target (classic IVM, delta-propagation form): when a change
  * batch arrives, only the TOUCHED KEYS' contributions are recomputed —
  * the view updates in O(batch), never O(table).
  *
  *   view' = view ⊕ contrib(merged touched keys) ⊖ contrib(old touched keys)
  *
  * using count/sum aggregates (the self-invertible group) — the batch's
  * merge semantics (version guards, tombstones, upserts) come from
  * [[CdcMerge.applyChanges]] itself, so the delta is correct for every
  * dialect by construction.
  *
  * Scale: `touched` is a key-distinct of the batch; old contributions come
  * from a semi-join on the target (a point-lookup pattern on a key-bucketed
  * target), both contribution aggs are bounded by |groups|, and the final
  * fold is a union of three ≤|groups|-row frames. Numerically the folded
  * double sums can differ from a full recompute in the last ulps — round
  * view outputs (the gate does), or keep sums in DECIMAL where exactness
  * is contractual.
  */
object IncrementalAgg {

  /** One maintenance step: fold a deduplicated change batch into the view.
    *
    * @param view        current (groupCols, cnt, sum_value) rows
    * @param targetState current merge-target state (pre-batch)
    * @param latest      change batch, already deduplicated per key
    * @param groupCols   view grouping columns (present in both target rows
    *                    and change rows)
    * @param valueCol    summed measure
    */
  /** Type-preserving empty-sum zero: `coalesce(sum(x), lit(0.0))` would
    * pull a DECIMAL sum to DOUBLE through coercion — silently destroying
    * the exactness the operator's doc tells callers DECIMAL preserves. The
    * zero literal is cast to the measure's own type instead, so the sum
    * column keeps its input family (decimal stays decimal, long stays
    * long, double stays double).
    */
  private def sumOrZero(df: DataFrame, valueCol: String): Column = {
    val t = df.select(col(valueCol)).schema.head.dataType
    coalesce(sum(col(valueCol)), lit(0).cast(t))
  }

  def maintain(view: DataFrame, targetState: DataFrame, latest: DataFrame,
               keyCol: String, dialect: MergeDialect,
               groupCols: Seq[String], valueCol: String): DataFrame = {
    val touched = latest.select(col(keyCol)).distinct()
    val oldTouched = targetState.join(touched, Seq(keyCol), "left_semi")
    val newTouched = CdcMerge.applyChanges(oldTouched, latest, keyCol, dialect)

    def contrib(df: DataFrame, sign: Int): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg((count(lit(1)) * sign).as("cnt"),
          (sumOrZero(df, valueCol) * sign).as("sum_value"))

    view.select(groupCols.map(col) :+ col("cnt") :+ col("sum_value"): _*)
      .unionByName(contrib(newTouched, 1))
      .unionByName(contrib(oldTouched, -1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_value")).as("sum_value"))
      .filter(col("cnt") > 0)
  }

  /** Bootstrap the view from the current target state (the one full pass;
    * afterwards only [[maintain]] runs).
    */
  def bootstrap(targetState: DataFrame, groupCols: Seq[String],
                valueCol: String): DataFrame =
    targetState.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumOrZero(targetState, valueCol).as("sum_value"))

  /** Maintenance for NON-INVERTIBLE aggregates (min/max/count-distinct —
    * anything you can't subtract a departed row from): recompute ONLY the
    * AFFECTED GROUPS from the post-merge state, pass every other group's
    * view row through untouched.
    *
    *   affected = groups of (old rows of touched keys) ∪ (their merged rows)
    *   view'    = (view ⊖ affected) ∪ recompute(state' ⋉ affected)
    *
    * The group-recompute scan is a semi-join on the grouping key — with the
    * state partitioned/bucketed by `groupCols` it partition-prunes to the
    * affected slices, so cost is ∝ rows IN AFFECTED GROUPS, not the table.
    * This is the standard IVM split: delta-propagate the invertible
    * aggregates ([[maintain]]), group-recompute the rest.
    *
    * @param aggs (outputName, aggregate expression) evaluated per group
    */
  def maintainByGroupRecompute(view: DataFrame, targetState: DataFrame,
                               latest: DataFrame, keyCol: String,
                               dialect: MergeDialect, groupCols: Seq[String],
                               aggs: Seq[(String, Column)]): DataFrame = {
    val touched = latest.select(col(keyCol)).distinct()
    val oldTouched = targetState.join(touched, Seq(keyCol), "left_semi")
    val newTouched = CdcMerge.applyChanges(oldTouched, latest, keyCol, dialect)
    val affected = oldTouched.select(groupCols.map(col): _*)
      .unionByName(newTouched.select(groupCols.map(col): _*))
      .distinct()
    // state' ⋉ affected, built WITHOUT merging the whole table: untouched
    // keys' rows are identical pre/post merge, so the recompute input is
    // (table ∖ touched keys) ⋉ affected  ∪  merged touched-key rows ⋉
    // affected. Both prunes are joins against SMALL frames (touched keys,
    // affected groups) that broadcast — the table is scanned but never
    // shuffled, whereas a full applyChanges(table, batch) plans a
    // full-outer sort-merge join that shuffles the entire table per batch
    // (the O(table) cost the doc above promises this operator avoids).
    val untouchedInAffected = semiByGroups(
      targetState.join(touched, Seq(keyCol), "left_anti"),
      affected, groupCols, anti = false)
    val mergedInAffected = semiByGroups(newTouched, affected, groupCols, anti = false)
    val recomputeInput = CdcMerge.alignTo(untouchedInAffected, newTouched.schema)
      .unionByName(mergedInAffected)
    val recomputed = recomputeInput
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    semiByGroups(view, affected, groupCols, anti = true)
      .unionByName(recomputed)
  }

  /** Null-safe grouped semi/anti join: a NULL group value is a real group
    * (groupBy treats it as one), so the membership join must use `<=>` —
    * a plain equi-join would silently drop the null group from the
    * recompute AND keep its stale view row. Shared with [[graft.streaming]]
    * (ViewSink's recovery path) so the subtle null-group rule lives once.
    */
  private[graft] def semiByGroups(df: DataFrame, groups: DataFrame,
                                  groupCols: Seq[String], anti: Boolean): DataFrame = {
    val g = groups.toDF(groupCols.map(c => s"__g_$c"): _*)
    val on = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(g, on, if (anti) "left_anti" else "left_semi")
  }
}
