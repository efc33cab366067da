package graft.streaming

import graft.operators.Scd2
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming maintenance of an SCD type-2 history table: each micro-batch of
  * CDC changes folds into the versioned history target through
  * [[Scd2.applyChanges]] — the history-preserving counterpart of
  * [[CdcPipeline]]'s type-1 merge sink.
  *
  * Contract (pinned in `Scd2SinkSpec`): any partition of the change feed
  * into micro-batches produces the SAME history as one
  * [[Scd2.buildHistory]] over the whole feed, provided batches arrive in
  * version order per key (the CDC watermark guarantee every merge sink here
  * already relies on). Re-delivered batches are no-ops (version-collapse
  * inside buildHistory), so checkpoint replay after a crash is safe.
  *
  * Scale: per batch, only the touched keys' history rows are rebuilt
  * (applyChanges semi-joins the batch keys); the untouched majority of the
  * history passes through the commit unchanged — the same day-2 cost
  * profile as the type-1 merge.
  */
object Scd2Sink {

  /** Fold one micro-batch into the history target (creates it on first
    * batch). Shaped for `writeStream.foreachBatch((df, id) => processBatch(...))`.
    */
  def processBatch(target: ParquetTarget, batch: DataFrame, keyCol: String,
                   versionCol: String, tracked: Seq[String],
                   isDelete: Column = lit(false)): Unit = {
    // persisted for the duration: the emptiness probe and the history
    // commit are separate actions, and an unpersisted streaming batch
    // would re-pull its source per action (CdcPipeline.runBatch discipline)
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (pinned.isEmpty) return // empty-batch short-circuit (T11 discipline)
      val updated =
        if (target.exists)
          Scd2.applyChanges(target.read(), pinned, keyCol, versionCol, tracked, isDelete)
        else
          Scd2.buildHistory(pinned, keyCol, versionCol, tracked, isDelete)
      target.commit(updated)
    } finally pinned.unpersist()
  }

  /** Convenience: the `(DataFrame, Long) => Unit` foreachBatch function.
    * Every `maintenanceEvery`-th batch also expires old snapshots and
    * removes orphans (the CdcPipeline X1–X3 discipline) — without it a
    * long-lived stream accumulates one full table copy per batch until
    * the disk fills. 0 disables (caller owns maintenance).
    */
  def foreachBatchFn(target: ParquetTarget, keyCol: String, versionCol: String,
                     tracked: Seq[String], isDelete: Column = lit(false),
                     maintenanceEvery: Int = 10, snapshotsToKeep: Int = 3)
      : (DataFrame, Long) => Unit =
    (df, batchId) => {
      processBatch(target, df, keyCol, versionCol, tracked, isDelete)
      if (maintenanceEvery > 0 && (batchId + 1) % maintenanceEvery == 0) {
        target.expireSnapshots(snapshotsToKeep)
        target.removeOrphans()
      }
    }

  /** Consumption-side default: enrich facts with the dimension state each
    * key held at the fact's own version, read from the maintained history
    * target. Uses the hot-key-bounded bucketed join with the bucket width
    * AUTO-derived from the history's interval-length distribution
    * ([[Scd2.asOfJoinBucketedAuto]]) — the streaming composition needs no
    * pre-knowledge of the version distribution, and output is row-for-row
    * identical to the plain [[Scd2.asOfJoin]].
    */
  def enrich(target: ParquetTarget, facts: DataFrame, keyCol: String,
             factVersion: Column): DataFrame =
    Scd2.asOfJoinBucketedAuto(facts, target.read(), keyCol, factVersion)
}
