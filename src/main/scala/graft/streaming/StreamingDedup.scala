package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch streaming deduplication: emit each key's row only the FIRST
  * time it is seen across the life of the stream, with optional state TTL.
  *
  * The reference deliberately keeps dedup per-micro-batch and relies on the
  * version-guarded MERGE for cross-batch correctness (SURVEY §7.4
  * "streaming-state-free design") — that remains the CDC path here. This
  * operator is the training-data-pipeline extension (SURVEY §7.5): exact
  * streaming dedup of a document/event feed BEFORE any sink, where the sink
  * has no merge (e.g. appending to a corpus).
  *
  * State is one boolean-sized record per distinct key; with a fingerprint
  * key (16-byte md5) a billion distinct documents hold ~50 GB of state
  * cluster-wide — use `GroupStateTimeout.ProcessingTimeTimeout` + `ttlMillis`
  * to bound it for unbounded keyspaces.
  */
object StreamingDedup {

  final case class Keyed(key: String, payload: String)

  def step(ttlMillis: Long)(key: String, rows: Iterator[Keyed],
                            state: GroupState[Boolean]): Iterator[Keyed] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val first = if (state.exists) Iterator.empty else rows.take(1)
    val out = first.toSeq
    if (out.nonEmpty || state.exists) {
      state.update(true)
      if (ttlMillis > 0) {
        try state.setTimeoutDuration(ttlMillis)
        catch { case _: UnsupportedOperationException => () }
      }
    }
    out.iterator
  }

  /** First-seen filter over a keyed stream. `ttlMillis <= 0` keeps state
    * forever (NoTimeout — required for `processAllAvailable`-style tests).
    */
  def firstSeen(ds: Dataset[Keyed], ttlMillis: Long = 0L): Dataset[Keyed] = {
    implicit val keyedEnc = Encoders.product[Keyed]
    implicit val boolEnc = Encoders.scalaBoolean
    implicit val strEnc = Encoders.STRING
    val timeout =
      if (ttlMillis > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(step(ttlMillis))
  }
}
