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
