package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — gap-based sessions over a keyed event
  * stream via `flatMapGroupsWithState`. Beyond the reference's surface (it
  * has no event-time operators, SURVEY §2.8 T10) but a first-class need for
  * the training-data pipeline: user/session grouping of interaction logs at
  * ingest time, emitting each session exactly once when its inactivity gap
  * expires.
  *
  * State per key is one open session (constant size), so a 100 TB replay
  * holds |active keys| session records cluster-wide — the shuffle is on the
  * session key, state lives in the state store, and output is append-mode
  * (closed sessions only).
  */
object Sessionize {

  final case class Event(userId: Long, tsMillis: Long, value: Double)
  final case class OpenSession(start: Long, lastTs: Long, nEvents: Long, sumValue: Double)
  final case class ClosedSession(userId: Long, start: Long, end: Long,
                                 nEvents: Long, sumValue: Double)

  /** Fold new events into the open session; emit closed sessions whenever a
    * gap exceeds `gapMillis` (or on state timeout in a live stream).
    */
  def step(gapMillis: Long)(userId: Long, events: Iterator[Event],
                            state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(userId, s.start, s.lastTs, s.nEvents, s.sumValue))
    }
    val sorted = events.toSeq.sortBy(_.tsMillis)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.tsMillis - s.lastTs <= gapMillis =>
          open = Some(OpenSession(s.start, e.tsMillis, s.nEvents + 1, s.sumValue + e.value))
        case Some(s) =>
          closed += ClosedSession(userId, s.start, s.lastTs, s.nEvents, s.sumValue)
          open = Some(OpenSession(e.tsMillis, e.tsMillis, 1L, e.value))
        case None =>
          open = Some(OpenSession(e.tsMillis, e.tsMillis, 1L, e.value))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        // only meaningful under ProcessingTimeTimeout; no-op otherwise
        try state.setTimeoutDuration(gapMillis)
        catch { case _: UnsupportedOperationException => () }
      case None => ()
    }
    closed.result().iterator
  }

  /** The same gap sessions via Spark's NATIVE `session_window` aggregation —
    * no user state function at all: the engine merges overlapping
    * [ts, ts+gap) windows per key inside a regular (partial-aggregating)
    * hash aggregate, and in streaming mode closes a session when the
    * watermark passes its end. Prefer this path when the per-session output
    * is expressible as aggregates (count/sum/min/max); drop to
    * [[sessions]]' `flatMapGroupsWithState` only for imperative per-session
    * logic the aggregate language can't express.
    *
    * Output matches [[sessions]]' shape: `end` is the LAST EVENT's
    * timestamp (session_window's raw end is lastTs + gap; the gap is
    * subtracted here), so the two paths are directly comparable —
    * `SessionizeSpec` pins the parity. Boundary nuance: session_window
    * merges strictly-closer-than-gap events (`<`), [[sessions]] uses `<=`;
    * identical except for events exactly at the gap.
    *
    * In streaming mode pass `watermark` (append output emits only
    * watermark-closed sessions — the watermark must live on the SAME
    * event-time column the session groups on); in batch mode leave it
    * None and every session is emitted.
    */
  def sessionsNative(events: Dataset[Event], gapMillis: Long,
                     watermark: Option[String] = None): Dataset[ClosedSession] = {
    import org.apache.spark.sql.functions._
    implicit val closedEnc = Encoders.product[ClosedSession]
    val timed = events.toDF().withColumn("__ts", timestamp_millis(col("tsMillis")))
    watermark.fold(timed)(timed.withWatermark("__ts", _))
      .groupBy(col("userId"),
        session_window(col("__ts"), s"$gapMillis milliseconds").as("__w"))
      .agg(count(lit(1)).as("nEvents"), sum(col("value")).as("sumValue"))
      .select(col("userId"),
        unix_millis(col("__w.start")).as("start"),
        (unix_millis(col("__w.end")) - gapMillis).as("end"),
        col("nEvents"), col("sumValue"))
      .as[ClosedSession]
  }

  /** Wire the sessionizer over a keyed event Dataset (works identically for
    * a streaming Dataset — same function, Append mode).
    *
    * `timeout` defaults to NoTimeout: sessions close when a later event for
    * the key arrives past the gap. Pass ProcessingTimeTimeout for live
    * streams that must flush idle sessions — note the engine then schedules
    * micro-batches continuously to fire timeouts, so
    * `processAllAvailable()` no longer terminates (test with NoTimeout).
    */
  def sessions(events: Dataset[Event], gapMillis: Long,
               timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[ClosedSession] = {
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(step(gapMillis))
  }
}
