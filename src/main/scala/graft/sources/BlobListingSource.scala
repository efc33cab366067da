package graft.sources

import graft.core.{MergeKey, RetryPolicy, Watermark}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blob/file-listing CDC source: list a prefix, take files newer than the
  * watermark, read them, enrich each row with the blob-dialect merge key and a
  * `createdon` version column from the file modification time.
  *
  * Re-expresses the reference's BlobListingStreamingSource family
  * (/root/reference/src/main/scala/services/blobsource/readers/listing/
  * BlobListingStreamingSource.scala:110-119, BlobListingParquetStreamingSource.scala:90-112,
  * enrichment models/batches/BlobBatchCommons.scala:21-51) on the Hadoop
  * FileSystem API — the same code path serves local files, s3a:// and
  * abfss:// with no source changes, and Spark parallelizes the file reads
  * across executors (the reference hand-schedules cores×10 file groups;
  * Spark's split planning makes that knob unnecessary).
  *
  * `createdon` comes from `_metadata.file_modification_time`, so the version
  * column is computed inside the scan without a second listing pass.
  */
final case class BlobSourceConfig(
    path: String,
    format: String = "parquet",           // parquet | json | csv | orc | text
    pkColumns: Seq[String] = Nil,          // merge key = base64 sha256 of these
    readerOptions: Map[String, String] = Map.empty,
    // Pre-configured source schema (reference
    // BlobListingParquetStreamingSource.scala:43-49): when set, the scan
    // uses it instead of footer/sample inference — the reference's own docs
    // warn that inference "can cause data corruption or stream failure if
    // source is empty". Supply a StructType directly, a Spark DDL string
    // ("a INT, b STRING"), or the reference's wire format: Base64 of a
    // parquet file whose footer carries the schema (BlobSchema helpers).
    sourceSchema: Option[org.apache.spark.sql.types.StructType] = None)

object BlobListingSource {

  /** List files under the prefix that are NEW relative to the watermark:
    * modTime strictly after it, OR sharing the boundary timestamp but not
    * in the already-consumed boundary set. The inclusive boundary matters
    * because blob stores stamp mod times at coarse (often 1 s) granularity
    * — the reference filters `createdOn >= startFrom` for the same reason
    * — and a strict `>` would PERMANENTLY skip a file that surfaces in the
    * listing after a same-timestamp batch committed (eventual consistency
    * / in-flight writes). The boundary set keeps the inclusive comparison
    * from re-reading the same files every poll.
    *
    * Returns (files, maxModTime, boundary hashes at maxModTime — carrying
    * forward the old boundary when the max did not advance).
    *
    * The whole listing (existence probe + recursive iteration) runs under
    * `retry`: remote-store listings fail transiently in exactly the way the
    * reference retries its Azure reads (AzureBlobStorageReader.scala:70),
    * and a listing is idempotent so re-running it is always safe. The
    * retry is around the complete pass — an IOException mid-iteration
    * restarts the listing rather than resuming a half-consumed iterator.
    */
  def listNewFiles(spark: SparkSession, path: String, afterMillis: Long,
                   boundary: Set[String] = Set.empty,
                   retry: RetryPolicy = RetryPolicy()): (Seq[String], Long, Seq[String]) = retry {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (Nil, afterMillis, boundary.toSeq)
    else {
      // a boundary that overflowed the watermark cap degraded to exclusive
      // semantics when it was written; honor that by never re-admitting
      // boundary-timestamp files we can't distinguish. Overflow is the
      // EXPLICIT marker (new writers store at most cap−1 real hashes, so a
      // full-size set is unambiguous); the size check only preserves the
      // old degrade semantics for legacy watermarks written at the cap.
      val boundaryExhaustive =
        !boundary.contains(Watermark.BlobBoundaryOverflow) &&
          boundary.size < graft.core.Watermark.BlobBoundaryCap
      val it = fs.listFiles(p, true)
      val files = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
          val mt = st.getModificationTime
          val isNew = mt > afterMillis ||
            (mt == afterMillis && boundaryExhaustive &&
              !boundary.contains(Watermark.blobFileHash(st.getPath.toString)))
          if (isNew) files += ((st.getPath.toString, mt))
        }
      }
      val out = files.result()
      if (out.isEmpty) (Nil, afterMillis, boundary.toSeq)
      else {
        val maxMod = out.map(_._2).max
        val atMax = out.filter(_._2 == maxMod)
          .map(f => Watermark.blobFileHash(f._1))
        // the max did not advance → this batch EXTENDS the old boundary
        val newBoundary =
          if (maxMod == afterMillis) (boundary.toSeq ++ atMax).distinct else atMax
        (out.map(_._1), maxMod, newBoundary)
      }
    }
  }

  /** Read one change batch: files newer than `watermark`, enriched with
    * ARCANE_MERGE_KEY + createdon. Returns None when no new files (the
    * empty-batch short-circuit, reference T11). A watermark of the wrong
    * kind or with an unparseable version fails LOUDLY — treating corrupt
    * resume state as "fresh start" would silently re-read the full prefix.
    */
  def nextBatch(spark: SparkSession, cfg: BlobSourceConfig,
                watermark: Option[Watermark],
                retry: RetryPolicy = RetryPolicy()): Option[(DataFrame, Watermark)] = {
    val (after, boundary) = watermark match {
      case None => (Long.MinValue, Set.empty[String])
      case Some(w) =>
        require(w.kind == Watermark.Blob,
          s"blob source resumed with a '${w.kind}' watermark — wrong target state?")
        Watermark.blobParts(w.version).getOrElse(
          throw new IllegalStateException(
            s"corrupt blob watermark version '${w.version}'"))
    }
    val (files, maxMod, newBoundary) = listNewFiles(spark, cfg.path, after, boundary, retry)
    if (files.isEmpty) None
    else {
      // defaults first, user readerOptions AFTER so they win: CSV header
      // handling is a default (true — the common labeled-export shape),
      // not an override that silently eats the first row of a headerless
      // feed configured with header=false
      val reader0 = spark.read
        .option("header", "true")
        .options(cfg.readerOptions)
      // a pre-configured schema also skips the inference pass over the
      // listing — one fewer full-file-set touch per micro-batch at scale
      val reader = cfg.sourceSchema.fold(reader0)(reader0.schema)
      val df = cfg.format match {
        case "parquet" => reader.parquet(files: _*)
        case "json" => reader.json(files: _*)
        case "csv" => reader.csv(files: _*)
        case "orc" => reader.orc(files: _*)
        // one `value` column per line; the whole-row merge-key default then
        // fingerprints the line itself
        case "text" => reader.text(files: _*)
        case other => throw new IllegalArgumentException(s"unsupported format: $other")
      }
      Some((enrich(df, cfg.pkColumns), Watermark.blobWithBoundary(maxMod, newBoundary)))
    }
  }

  /** Pre-configured schema constructors for [[BlobSourceConfig.sourceSchema]]. */
  object BlobSchema {

    /** Spark DDL, e.g. `"id BIGINT, name STRING"`. */
    def fromDdl(ddl: String): org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType.fromDDL(ddl)

    /** An Avro schema JSON string — the wire format the reference's JSON
      * scanner takes (JsonScanner.scala:20-163). See [[AvroSchemaConverter]]
      * for the type mapping.
      */
    def fromAvro(avroJson: String): org.apache.spark.sql.types.StructType =
      AvroSchemaConverter.toStructType(avroJson)

    /** The reference's wire format: Base64 of a parquet file; the schema is
      * read from its footer (reference decodes the same payload through its
      * ParquetScanner, BlobListingParquetStreamingSource.scala:43-46).
      */
    def fromBase64Parquet(spark: SparkSession, b64: String): org.apache.spark.sql.types.StructType = {
      val bytes = java.util.Base64.getDecoder.decode(b64)
      val tmp = java.nio.file.Files.createTempFile("graft-schema", ".parquet")
      try {
        java.nio.file.Files.write(tmp, bytes)
        // explicit file:// scheme: the temp file is DRIVER-LOCAL, and a
        // schemeless path would resolve against fs.defaultFS (hdfs/abfss
        // on a real cluster) where it does not exist
        spark.read.parquet(tmp.toUri.toString).schema
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** Blob enrichment: Base64-SHA256 merge key over PKs (all columns when no
    * PKs configured — whole-row identity, reference BlobBatchCommons) and the
    * file modification time as the version column.
    */
  def enrich(df: DataFrame, pkColumns: Seq[String]): DataFrame = {
    val pks = if (pkColumns.nonEmpty) pkColumns else df.columns.toSeq
    df.withColumn(MergeKey.MergeKeyColumn, MergeKey.mergeKeyBase64(pks.map(col)))
      .withColumn("createdon",
        (unix_millis(col("_metadata.file_modification_time"))).cast("long"))
  }
}
