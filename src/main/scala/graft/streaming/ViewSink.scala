package graft.streaming

import graft.operators.{CdcMerge, Dedup, IncrementalAgg, MergeDialect}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of a grouped-aggregate materialized view AND its
  * merge target: each micro-batch dedups, folds the view by delta
  * propagation ([[IncrementalAgg.maintain]] — O(batch)), then advances the
  * target state ([[CdcMerge.applyChanges]]). The view commit is derived
  * from the SAME deduplicated batch as the target commit, so the two
  * snapshots can never drift apart (parity pinned in `ViewSinkSpec`).
  *
  * This closes the loop the reference leaves to the warehouse: its
  * consumers merge into a table and downstream dashboards re-aggregate it
  * per query; here the aggregate ships WITH the table, maintained for the
  * price of the batch.
  */
object ViewSink {

  /** Fold one micro-batch into (viewTarget, stateTarget). Creates both on
    * the first batch.
    *
    * Crash safety: the two commits are not atomic, so the pair advances in
    * LOCKSTEP (one commit each per batch) and the view is recomputed from
    * the COMMITTED state for the affected groups. A crash between the two
    * commits leaves the versions out of step; the next call detects the
    * mismatch and rebuilds the view from the state once (the bounded
    * recovery path) before folding the new batch incrementally. Batch
    * re-delivery without a crash is naturally convergent: the state merge
    * is version-guard idempotent and the group recompute reads the state,
    * not a delta. Delta propagation ([[IncrementalAgg.maintain]]) is
    * cheaper but not replay-safe when the view outruns the state — keep it
    * for batch flows whose caller controls atomicity.
    */
  def processBatch(viewTarget: ParquetTarget, stateTarget: ParquetTarget,
                   batch: DataFrame, keyCol: String, dialect: MergeDialect,
                   groupCols: Seq[String], valueCol: String): Unit = {
    if (batch.isEmpty) return
    val latest = Dedup.latestByKey(batch, col(keyCol), dialect.versionOrder(col))
    if (!stateTarget.exists) {
      val state0 = latest.filter(!dialect.isDelete(col))
      stateTarget.commit(state0)
      viewTarget.commit(IncrementalAgg.bootstrap(state0, groupCols, valueCol))
      return
    }
    // lockstep recovery: a crash between the state and view commits (or a
    // state advanced outside this sink) strands the view one version
    // behind — rebuild it from the committed state before folding
    if (viewTarget.currentVersion != stateTarget.currentVersion) {
      viewTarget.commit(IncrementalAgg.bootstrap(
        stateTarget.read(), groupCols, valueCol))
    }
    val state = stateTarget.read()
    // the batch's affected groups, read from the PRE-advance state + batch
    val touched = latest.select(col(keyCol)).distinct()
    val affected = state.join(touched, Seq(keyCol), "left_semi")
      .select(groupCols.map(col): _*)
      .unionByName(latest.select(groupCols.map(col): _*))
      .distinct().persist()
    affected.count() // pin BEFORE the state advances underneath it
    try {
      val state1 = CdcMerge.applyChanges(state, latest, keyCol, dialect)
      stateTarget.commit(state1)
      // view from the COMMITTED state: idempotent under replay
      val committed = stateTarget.read()
      val on = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
      val g = affected.toDF(groupCols.map(c => s"__g_$c"): _*)
      val recomputed = IncrementalAgg.bootstrap(
        committed.join(g, on, "left_semi"), groupCols, valueCol)
      val untouched = viewTarget.read().join(g, on, "left_anti")
      viewTarget.commit(untouched.unionByName(recomputed))
    } finally affected.unpersist()
  }

  /** The `(DataFrame, Long) => Unit` foreachBatch function. */
  def foreachBatchFn(viewTarget: ParquetTarget, stateTarget: ParquetTarget,
                     keyCol: String, dialect: MergeDialect,
                     groupCols: Seq[String], valueCol: String)
      : (DataFrame, Long) => Unit =
    (df, _) => processBatch(viewTarget, stateTarget, df, keyCol, dialect,
      groupCols, valueCol)
}
