package graft.streaming

import graft.functions.CorpusPipeline
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Streaming corpus ingestion with the day-2 dedup gate: each micro-batch
  * runs [[CorpusPipeline.prepareIncremental]] against the CURRENT standing
  * corpus (the target directory itself) and appends only the survivors —
  * the streaming face of the batch ingest funnel (in-batch prepare, exact
  * against-corpus dedup behind the Bloom prefilter, near-dup LSH gate).
  * Shaped for `writeStream.foreachBatch` like [[Scd2Sink]].
  *
  * Replay safety comes from the gate itself, not a transaction log: a
  * parquet batch write commits all-or-nothing (FileOutputCommitter), so a
  * retried micro-batch either (a) finds none of its rows in the corpus
  * (prior write never committed) and re-processes, or (b) finds ALL of them
  * (write committed, checkpoint didn't) and admits nothing — the
  * replay-idempotence property `CorpusPipelineSpec` pins at the batch
  * level. Either way the corpus ends correct.
  *
  * Cache lifecycle: [[CorpusPipeline.prepareIncrementalManaged]] persists
  * two frames per call (corpus keys, accepted candidates) and hands back a
  * release handle; the sink invokes it once the batch's write has
  * committed, so state is flat across any number of micro-batches
  * (spec-asserted). The release goes through Dataset.unpersist — i.e.
  * Spark's CacheManager — so the cached-PLAN entries die with the blocks;
  * raw RDD-level unpersist would leave them alive and the NEXT batch's
  * structurally-identical corpus scan would be rewritten to the stale
  * cached snapshot (the gate would then dedup against an old corpus
  * forever). Scoped to this call's own frames, never a global cache diff,
  * so concurrent queries on the same session are untouched.
  *
  * 100 TB posture: per batch the standing corpus contributes one keys-only
  * scan (Bloom build) and one signature scan (the banded funnel) — its text
  * never shuffles; everything batch-sided is bounded by the batch. For
  * corpora where even those two scans dominate, freeze the filter and
  * signatures between batches ([[graft.functions.BloomDedup]] /
  * `MinHashLsh.dedupAgainst`'s own building blocks) and refresh on a cadence
  * — the classic trade of staleness for scan count.
  */
object CorpusIngestSink {

  /** Process one micro-batch: gate against the standing corpus at
    * `targetDir`, append survivors, release the funnel's caches. Returns
    * the number of admitted rows.
    */
  def processBatch(spark: SparkSession, targetDir: String, batch: DataFrame,
                   cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
                   againstThreshold: Option[Double] = Some(0.8)): Long = {
    val standing = standingOf(spark, targetDir, batch)
    val (accepted, _, release) = CorpusPipeline.prepareIncrementalManaged(
      batch, standing, cfg, againstThreshold)
    try {
      // the count runs over the funnel's cached candidate frame, so the
      // second action (the write) re-reads cache, not the raw scan
      val n = accepted.count()
      if (n > 0) accepted.write.mode(SaveMode.Append).parquet(targetDir)
      n
    } finally release()
  }

  /** The `(DataFrame, Long) => Unit` foreachBatch function. */
  def foreachBatchFn(targetDir: String,
                     cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
                     againstThreshold: Option[Double] = Some(0.8))
      : (DataFrame, Long) => Unit =
    (batch, _) => { processBatch(batch.sparkSession, targetDir, batch, cfg,
      againstThreshold); () }

  /** The standing corpus: the target as written so far, or an empty frame
    * with the batch's schema before the first commit (prepare adds a
    * `split` column on write, so later reads carry it — `unionByName`
    * inside the funnel is name-based and indifferent to the extra column).
    */
  private def standingOf(spark: SparkSession, targetDir: String,
                         batch: DataFrame): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(targetDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).exists(
        s => s.isFile && s.getPath.getName.endsWith(".parquet")))
      spark.read.parquet(targetDir)
    else batch.limit(0)
  }
}
