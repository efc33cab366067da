package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState dedup: first occurrence passes (across AND within
  * batches), later duplicates drop, against the RocksDB state store the
  * operator requires. The conf flip is scoped and restored — the rest of
  * the suite keeps the default provider.
  */
class TransformWithStateDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence per key passes; duplicates drop across and within batches") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String)]
      val q = TransformWithStateDedup
        .firstByKey(input.toDS(), (r: (Long, String)) => r._1)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_out")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("twsckpt").toString)
        .start()
      try {
        input.addData((1L, "first"), (1L, "in-batch dup"), (2L, "two"))
        q.processAllAvailable()
        input.addData((1L, "cross-batch dup"), (3L, "three"))
        q.processAllAvailable()
        val got = spark.table("tws_out").as[(Long, String)].collect().toSet
        assert(got == Set((1L, "first"), (2L, "two"), (3L, "three")))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
