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
