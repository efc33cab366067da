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
    // the deduplicated batch is read by several actions below (affected-
    // group pin, state merge commit, bootstrap path) — persist it so a
    // streaming foreachBatch frame doesn't re-pull its source per action,
    // and so every action sees the SAME rows (the CdcPipeline.runBatch
    // discipline)
    val latest = Dedup.latestByKey(batch, col(keyCol), dialect.versionOrder(col))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
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
        // view from the COMMITTED state: idempotent under replay. The
        // null-safe grouped membership joins are IncrementalAgg's — the
        // `<=>` null-group rule lives in one place
        val committed = stateTarget.read()
        val recomputed = IncrementalAgg.bootstrap(
          IncrementalAgg.semiByGroups(committed, affected, groupCols, anti = false),
          groupCols, valueCol)
        val untouched =
          IncrementalAgg.semiByGroups(viewTarget.read(), affected, groupCols, anti = true)
        viewTarget.commit(untouched.unionByName(recomputed))
      } finally affected.unpersist()
    } finally latest.unpersist()
  }

  /** The `(DataFrame, Long) => Unit` foreachBatch function. Every
    * `maintenanceEvery`-th batch also expires old snapshots on BOTH
    * targets (CdcPipeline's X1–X3 discipline) — a long-lived stream
    * otherwise accumulates one full copy of each table per batch. 0
    * disables (caller owns maintenance).
    */
  def foreachBatchFn(viewTarget: ParquetTarget, stateTarget: ParquetTarget,
                     keyCol: String, dialect: MergeDialect,
                     groupCols: Seq[String], valueCol: String,
                     maintenanceEvery: Int = 10, snapshotsToKeep: Int = 3)
      : (DataFrame, Long) => Unit =
    (df, batchId) => {
      processBatch(viewTarget, stateTarget, df, keyCol, dialect,
        groupCols, valueCol)
      if (maintenanceEvery > 0 && (batchId + 1) % maintenanceEvery == 0) {
        // the lockstep-recovery check compares version NUMBERS, which
        // expiry never rewrites (it deletes old snapshot dirs only), so
        // maintenance cannot desynchronize the pair
        Seq(viewTarget, stateTarget).foreach { t =>
          t.expireSnapshots(snapshotsToKeep)
          t.removeOrphans()
        }
      }
    }
}
