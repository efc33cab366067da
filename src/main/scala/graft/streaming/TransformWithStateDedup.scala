package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}

/** Exact streaming dedup on Spark 4's arbitrary-state API
  * (`transformWithState` + `StatefulProcessor`, the successor of
  * `flatMapGroupsWithState` that [[StreamingDedup]] uses): first occurrence
  * of a key passes, every later one drops. State is one boolean per key in
  * the RocksDB state store with an optional TTL — the knob that keeps
  * 100 TB/day ingest state bounded (after `ttl` of silence a key's dedup
  * record expires and the key may re-emit, the same trade
  * `dropDuplicatesWithinWatermark` makes on event time).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` (the transformWithState contract).
  */
object TransformWithStateDedup {

  class FirstSeenProcessor[K, V](ttl: TTLConfig)(implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, V, V] {

    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)

    override def handleInputRows(key: K, rows: Iterator[V],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[V] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        rows.take(1) // first occurrence within the batch wins too
      }
    }
  }

  /** First-occurrence pass-through over a keyed stream. */
  def firstByKey[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
                                         ttl: TTLConfig = TTLConfig.NONE): Dataset[V] =
    ds.groupByKey(key)
      .transformWithState(new FirstSeenProcessor[K, V](ttl),
        TimeMode.None(), OutputMode.Append())
}
