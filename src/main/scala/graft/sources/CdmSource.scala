package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synapse Link CDM (Common Data Model) folder-batch source.
  *
  * The reference lists hourly batch folders named `yyyy-MM-ddTHH.mm.ssZ`,
  * excludes the in-progress one (Changelog/changelog.info), reads each
  * entity's CSVs with the schema from the per-batch `model.json`, and — the
  * correctness-critical detail — orders files DESCENDING by numeric name so
  * deletions in `1.csv` apply last
  * (/root/reference/src/main/scala/services/synapse/base/
  * SynapseLinkStreamingSource.scala:79-82,154-176).
  *
  * Spark's CSV reader gives no cross-file ordering, so the file sequence is
  * threaded into the data instead: a `_file_seq` column derived from the file
  * name ranks rows, and the downstream dedup orders by
  * (versionnumber, _file_seq) — order-independence by construction, which is
  * the only strategy that survives distributed reads (SURVEY §7.4).
  */
object CdmSource {

  /** CDM attribute-type → Spark type, mirroring SimpleCdmModel.scala:54-63
    * (note: CDM "decimal" maps to Double there — preserved).
    */
  def cdmTypeToSpark(dataType: String): DataType = dataType.toLowerCase(java.util.Locale.ROOT) match {
    case "guid" | "string" => StringType
    case "int64" => LongType
    case "decimal" => DoubleType
    case "datetime" => TimestampNTZType
    case "datetimeoffset" => TimestampType
    case "boolean" => BooleanType
    case _ => StringType
  }

  /** Minimal model.json parse (entity → attributes[name, dataType]) without a
    * JSON library dependency: regex-scoped to the requested entity block.
    */
  def schemaFromModelJson(modelJson: String, entity: String): StructType = {
    val entityRe =
      ("""\{\s*"\$type"[^{}]*"name"\s*:\s*"""" + java.util.regex.Pattern.quote(entity) +
        """"[\s\S]*?"attributes"\s*:\s*\[([\s\S]*?)\]""").r
    val attrRe = """\{[^{}]*?"name"\s*:\s*"([^"]+)"[^{}]*?"dataType"\s*:\s*"([^"]+)"[^{}]*?\}""".r
    entityRe.findFirstMatchIn(modelJson) match {
      case Some(m) =>
        val fields = attrRe.findAllMatchIn(m.group(1)).map { am =>
          StructField(am.group(1), cdmTypeToSpark(am.group(2)), nullable = true)
        }.toArray
        StructType(fields)
      case None =>
        throw new IllegalArgumentException(s"entity '$entity' not found in model.json")
    }
  }

  /** Per-column timestamp parsing dialects
    * (SynapseLinkStreamingSource.scala:229-251): SinkCreatedOn/SinkModifiedOn
    * use `M/d/yyyy h:mm:ss a`, CreatedOn uses ISO offset, everything else ISO
    * local with optional 'Z'.
    */
  def parseCdmTimestamp(colName: String, c: Column): Column = colName match {
    // try_* + ISO fallbacks on the NAMED dialects too: Synapse export
    // formats vary across versions, and under ANSI mode (Spark 4 default)
    // a throwing to_timestamp would kill the whole micro-batch on the
    // first value that arrives ISO-shaped (or malformed) instead of in
    // the documented M/d/yyyy form — unparseable values become NULL, the
    // same tolerance the default branch always had
    case "SinkCreatedOn" | "SinkModifiedOn" =>
      coalesce(
        try_to_timestamp(c, lit("M/d/yyyy h:mm:ss a")),
        try_to_timestamp(c))
    case "CreatedOn" => try_to_timestamp(c) // ISO offset — Spark default handles it
    case _ =>
      // try_* variants: ANSI mode (Spark 4 default) would otherwise throw on
      // the first non-matching dialect instead of falling through.
      coalesce(
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSS'Z'")),
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
        try_to_timestamp(c))
  }

  /** The batch folder currently being written, from
    * `Changelog/changelog.info` under the container root — the writer
    * updates this file to the name of the folder it is filling, so every
    * folder strictly before it is complete and safe to read
    * (ref SynapseAzureBlobReaderExtensions.scala:85-116: eligible dates are
    * `>= startFrom` and `< parse(changelog.info)`). Returns None when the
    * file is absent (no batch in progress / legacy layout), in which case
    * all listed folders are eligible.
    */
  def readInProgressFolder(spark: SparkSession, root: String,
                           retry: graft.core.RetryPolicy = graft.core.RetryPolicy()): Option[String] = retry {
    val p = new Path(root, "Changelog/changelog.info")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val content = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        if (content.isEmpty) None else Some(content)
      } finally in.close()
    }
  }

  /** Complete (safe-to-read) batch folders after `afterFolder`: lists the
    * root and excludes the in-progress folder announced by
    * `Changelog/changelog.info` — the torn-batch guard every production
    * Synapse reader needs.
    */
  def listCompleteBatchFolders(spark: SparkSession, root: String,
                               afterFolder: Option[String],
                               retry: graft.core.RetryPolicy = graft.core.RetryPolicy()): Seq[String] =
    listBatchFolders(spark, root, afterFolder,
      readInProgressFolder(spark, root, retry), retry)

  /** Batch folders under `root` with names in (afterFolder, beforeFolder],
    * sorted ascending — `yyyy-MM-ddTHH.mm.ssZ` names sort chronologically as
    * strings, which is exactly how the reference prunes by hour prefix.
    * Listing runs under `retry`, like [[BlobListingSource.listNewFiles]]
    * (ref AzureBlobStorageReader.scala:70 retries its Azure listings).
    */
  def listBatchFolders(spark: SparkSession, root: String,
                       afterFolder: Option[String], inProgress: Option[String],
                       retry: graft.core.RetryPolicy = graft.core.RetryPolicy()): Seq[String] = retry {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.matches("""\d{4}-\d{2}-\d{2}T\d{2}\.\d{2}\.\d{2}Z"""))
      .filter(n => afterFolder.forall(n > _))
      .filter(n => inProgress.forall(n < _))
      .sorted
  }

  /** Read one entity from a batch folder with deletes-last ordering baked in
    * as `_file_seq` (descending numeric file name → ascending sequence, so
    * larger `_file_seq` = applied later = wins the dedup tie).
    */
  def readEntity(spark: SparkSession, folderPath: String, entity: String,
                 schema: StructType): DataFrame = {
    val stringSchema = StructType(schema.fields.map(_.copy(dataType = StringType)))
    val raw = spark.read
      .schema(stringSchema)
      .option("multiLine", "true").option("quote", "\"").option("escape", "\"")
      .option("header", "false")
      .csv(s"$folderPath/$entity/*.csv")
      .withColumn("_file_name", element_at(split(input_file_name(), "/"), -1))
    // numeric file name N.csv → seq = -N  (descending name order = ascending seq)
    val withSeq = raw.withColumn("_file_seq",
      -regexp_extract(col("_file_name"), """(\d+)\.csv$""", 1).cast("long"))
      .drop("_file_name")
    // typed projection with per-column timestamp dialects
    schema.fields.foldLeft(withSeq) { (df, f) =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          df.withColumn(f.name, parseCdmTimestamp(f.name, col(f.name)).cast(f.dataType))
        case StringType => df
        case dt => df.withColumn(f.name, col(f.name).cast(dt))
      }
    }
  }
}
