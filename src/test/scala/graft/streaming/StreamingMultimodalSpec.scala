package graft.streaming

import graft.SparkSpec
import graft.functions.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The multimodal stages are stateless row transforms — `payloadMeta` is a
  * pure projection and `extractFeatures` a `mapPartitions` with no state —
  * so a media ingest stream gets the identical decode/metadata semantics
  * the batch pipeline applies, micro-batch by micro-batch, with no state
  * store. The decode path's per-thread codec reuse must also survive
  * repeated micro-batches on the same pooled executor threads.
  */
case class MediaRow(media_id: Long, payload: Array[Byte])

class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaFor(ids: Seq[Long]): Seq[MediaRow] =
    ids.map(id => MediaRow(id, Multimodal.encodePng(id)))

  private def features(df: DataFrame): DataFrame =
    Multimodal.extractFeatures(df, dim = 4)

  test("payloadMeta and extractFeatures run identically under streaming and batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MediaRow]
    val q = features(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("media_stream_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mmckpt").toString)
      .start()
    val batch1 = mediaFor(Seq(0L, 7L)) :+ MediaRow(99L, "not an image".getBytes)
    val batch2 = mediaFor(Seq(42L, 1234L))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      // second micro-batch re-enters the decode on the SAME pooled threads:
      // the per-thread reader cache must serve it, not poison it
      input.addData(batch2: _*)
      q.processAllAvailable()
      def key(df: DataFrame) = df
        .select($"media_id", $"n_bytes", $"features")
        .collect().map(r => (r.getLong(0), r.getInt(1),
          if (r.isNullAt(2)) null else r.getSeq[Float](2))).toSet
      val streamed = key(spark.table("media_stream_out"))
      val batch = key(features((batch1 ++ batch2).toDF()))
      assert(streamed == batch)
      assert(streamed.size == 5)
      // the non-image payload flows through with null features in both modes
      assert(streamed.count(_._3 == null) == 1)
    } finally q.stop()
  }
}
