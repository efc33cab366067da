package graft.streaming

import graft.SparkSpec
import graft.streaming.Sessionize.{ClosedSession, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch-mode sessionization closes sessions on gap") {
    val events = Seq(
      Event(1L, 0L, 1.0), Event(1L, 1000L, 2.0),     // session A (0-1000)
      Event(1L, 10000L, 3.0),                        // session B (10000)
      Event(2L, 500L, 5.0)                           // user 2, open session
    ).toDS()
    val out = Sessionize.sessions(events, gapMillis = 5000).collect()
    // batch mode emits only CLOSED sessions (user1 session A); open ones stay in state
    assert(out.toSeq == Seq(ClosedSession(1L, 0L, 1000L, 2L, 3.0)))
  }

  test("native session_window parity: same sessions as flatMapGroupsWithState") {
    // pseudo-random feed, gaps never exactly == gapMillis (the one
    // documented boundary difference); sentinel far-future event per key
    // forces the stateful path to close every real session
    val Sentinel = 1_000_000_000L
    val real = for {
      u <- 1L to 5L
      i <- 0 until 40
    } yield {
      val h = ((u * 7919 + i * 104729) % 9000) + (i.toLong * 3000)
      Event(u, h, (u + i).toDouble)
    }
    val feed = real ++ (1L to 5L).map(u => Event(u, Sentinel, 0.0))
    val stateful = Sessionize.sessions(feed.toDS(), gapMillis = 5000)
      .collect().toSet
    val native = Sessionize.sessionsNative(feed.toDS(), gapMillis = 5000)
      .filter($"start" =!= Sentinel) // the still-open sentinel sessions
      .collect().toSet
    assert(native == stateful, "native session_window must reproduce the stateful sessions")
    assert(native.nonEmpty && native.size > 5, s"degenerate fixture: ${native.size} sessions")
  }

  test("streaming native session_window closes sessions past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessionsNative(input.toDS(), gapMillis = 5000,
      watermark = Some("0 milliseconds"))
      .writeStream.outputMode("append")
      .format("memory").queryName("native_sessions_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("nsessckpt").toString)
      .start()
    try {
      input.addData(Event(1L, 0L, 1.0), Event(1L, 2000L, 1.0))
      q.processAllAvailable()
      assert(spark.table("native_sessions_out").count() == 0) // watermark not past end
      input.addData(Event(1L, 60000L, 1.0)) // advances watermark beyond 2000+gap
      q.processAllAvailable()
      val closed = spark.table("native_sessions_out").as[ClosedSession].collect()
      assert(closed.toSeq == Seq(ClosedSession(1L, 0L, 2000L, 2L, 2.0)))
    } finally q.stop()
  }

  test("streaming sessionization over MemoryStream emits closed sessions incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS(), gapMillis = 5000)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sessckpt").toString)
      .start()
    try {
      input.addData(Event(1L, 0L, 1.0), Event(1L, 2000L, 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // still open
      input.addData(Event(1L, 60000L, 1.0)) // gap > 5s closes the first session
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[ClosedSession].collect()
      assert(closed.toSeq == Seq(ClosedSession(1L, 0L, 2000L, 2L, 2.0)))
    } finally q.stop()
  }
}
