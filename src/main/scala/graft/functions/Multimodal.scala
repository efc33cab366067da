package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction runs as
  * a partition-mapped batch stage.
  *
  * The media codec libraries are NOT available in this environment, so the
  * decode kernel is a clearly marked STUB (deterministic fake derived from the
  * bytes). Everything around it — schema contract, batch iteration shape,
  * partition sizing, metadata propagation — is the real production plumbing:
  * swap `decodeStub` for a JNI/FFI codec call and nothing else changes.
  *
  * Scale notes: media rows are large and few, so the stage uses
  * `mapPartitions` (one iterator pass, no per-row task overhead) and callers
  * should `repartition` by byte-budget, not row count, before heavy decodes.
  */
object Multimodal {

  /** Canonical media schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Output schema of the feature-extraction stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** STUB decode kernel — deterministic fake standing in for a real codec.
    * Production: replace body with the image/audio decode + model featurizer;
    * signature (bytes in, fixed-width float features out) is the real one.
    */
  private[graft] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic byte-derived fake below
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = (h.toDouble / Long.MaxValue.toDouble).toFloat
      j += 1
    }
    out
  }

  /** Feature-extract a media frame: binary payload → float feature vector.
    * `mapPartitions` keeps one decoder instance per task (real codecs are
    * expensive to initialize) and streams rows without materializing the
    * partition.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    val input = media.select(col(idCol).cast("long"), col(payloadCol))
    input.mapPartitions { rows =>
      // per-task decoder init would happen here
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(id, bytes.length, decodeStub(bytes, dim))
      }
    }(enc).toDF()
  }

  /** Frame-sampling stage: split each media payload into fixed-size chunks
    * ("frames") and keep every `everyN`-th — the video/audio frame-sample
    * plumbing with a byte-chunker standing in for the codec's frame index.
    * Emits (media_id, frame_no, frame_bytes); downstream feature extraction
    * consumes frames exactly like whole payloads.
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = true)))

  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int,
                   idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        // ??? <- real demuxer/frame index goes here; byte chunking below
        val frames = bytes.grouped(frameBytes).zipWithIndex
        frames.collect { case (chunk, i) if i % everyN == 0 => Row(id, i, chunk) }
      }(enc).toDF()
  }

  /** Resize stage stub: deterministic downsample of a payload to
    * `targetBytes` by stride sampling — the image-resize slot (real impl:
    * decode → scale → re-encode); plumbing, schema and batch shape are real.
    */
  def resizePayload(media: DataFrame, targetBytes: Int,
                    idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    val resize = udf { bytes: Array[Byte] =>
      if (bytes == null || bytes.length <= targetBytes) bytes
      else {
        // ??? <- real scaler goes here; stride sampling below
        val stride = bytes.length.toDouble / targetBytes
        Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
      }
    }
    media.withColumn(payloadCol, resize(col(payloadCol)))
  }

  /** Synthesize a media frame from any table (test/demo path): payload bytes
    * derive deterministically from a source column, exercising the full
    * plumbing without codec libraries.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, fromCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(fromCol).cast("string"), "UTF-8").as("payload"),
      struct(
        lit("application/x-graft-demo").as("mime"),
        length(col(fromCol).cast("string")).cast("int").as("width"),
        lit(1).as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))
}
