package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingDedup.Keyed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first-seen dedup across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Keyed]
    val q = StreamingDedup.firstSeen(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ddckpt").toString)
      .start()
    try {
      input.addData(Keyed("a", "v1"), Keyed("b", "v1"), Keyed("a", "v2"))
      q.processAllAvailable()
      // within-batch: only the first 'a' row survives
      assert(spark.table("dedup_out").as[Keyed].collect().map(_.key).sorted.toSeq == Seq("a", "b"))
      input.addData(Keyed("a", "v3"), Keyed("c", "v1")) // 'a' seen in batch 1
      q.processAllAvailable()
      val keys = spark.table("dedup_out").as[Keyed].collect().map(_.key).sorted.toSeq
      assert(keys == Seq("a", "b", "c")) // 'a' NOT re-emitted
    } finally q.stop()
  }
}
