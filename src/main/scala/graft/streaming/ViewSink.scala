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
    val state = stateTarget.read()
    val view = viewTarget.read()
    // view first (it reads the PRE-batch state), then the state advance
    val view1 = IncrementalAgg.maintain(view, state, latest, keyCol, dialect,
      groupCols, valueCol)
    val state1 = CdcMerge.applyChanges(state, latest, keyCol, dialect)
    viewTarget.commit(view1)
    stateTarget.commit(state1)
  }

  /** The `(DataFrame, Long) => Unit` foreachBatch function. */
  def foreachBatchFn(viewTarget: ParquetTarget, stateTarget: ParquetTarget,
                     keyCol: String, dialect: MergeDialect,
                     groupCols: Seq[String], valueCol: String)
      : (DataFrame, Long) => Unit =
    (df, _) => processBatch(viewTarget, stateTarget, df, keyCol, dialect,
      groupCols, valueCol)
}
