package graft.streaming

import graft.SparkSpec
import graft.operators.{CdcMerge, Dedup, SynapseLinkDialect}
import graft.sources.CdmSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** End-to-end Synapse-Link CDM slice: folder-batch discovery → per-batch CSV
  * read with the reference's deletes-last file ordering → dedup ordered by
  * (versionnumber, _file_seq) → soft-delete merge. Covers the
  * correctness-critical ordering note at SynapseLinkStreamingSource.scala:79-82:
  * a delete row in 1.csv must beat a same-version insert in 2.csv.
  */
class CdmPipelineE2eSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("Id", StringType), StructField("versionnumber", LongType),
    StructField("IsDelete", BooleanType), StructField("payload", StringType)))

  private def writeBatch(root: String, folder: String, files: Map[String, String]): Unit = {
    val dir = Paths.get(root, folder, "acct")
    Files.createDirectories(dir)
    files.foreach { case (name, content) => Files.writeString(dir.resolve(name), content) }
  }

  test("folder batches merge in order; same-version delete in lower file wins") {
    val root = Files.createTempDirectory("cdm").toString
    // batch 1: inserts in 2.csv
    writeBatch(root, "2024-01-01T00.00.00Z", Map(
      "2.csv" -> "id1,1,False,a1\nid2,1,False,b1\n"))
    // batch 2: same version 2 for id1 appears in 2.csv (update) AND 1.csv
    // (delete) — numeric-descending file order means the delete applies last
    writeBatch(root, "2024-01-01T01.00.00Z", Map(
      "2.csv" -> "id1,2,False,a2\nid3,2,False,c1\n",
      "1.csv" -> "id1,2,True,a2\n"))

    val folders = CdmSource.listBatchFolders(spark, root, None, None)
    assert(folders == Seq("2024-01-01T00.00.00Z", "2024-01-01T01.00.00Z"))

    val target = new ParquetTarget(spark, Files.createTempDirectory("cdmtgt").toString)
    folders.foreach { f =>
      val batch = CdmSource.readEntity(spark, s"$root/$f", "acct", schema)
        .withColumn("ARCANE_MERGE_KEY", col("Id"))
      // dedup ordered by (versionnumber, _file_seq): file sequence breaks
      // same-version ties exactly like the reference's apply order
      val latest = Dedup.latestByKey(batch, col("ARCANE_MERGE_KEY"),
        Seq(col("versionnumber"), col("_file_seq")))
        .drop("_file_seq")
      val current = target.read(Some(latest.schema))
      target.commit(CdcMerge.applyChanges(current, latest, "ARCANE_MERGE_KEY", SynapseLinkDialect))
    }

    val rows = target.read().select("Id", "payload").as[(String, String)].collect().toMap
    // id1: deleted by the same-version tombstone in 1.csv; id2 from batch 1;
    // id3 inserted in batch 2
    assert(rows == Map("id2" -> "b1", "id3" -> "c1"))
  }

  test("multiline quoted CSV fields survive the reader") {
    val root = Files.createTempDirectory("cdm2").toString
    writeBatch(root, "2024-01-01T00.00.00Z", Map(
      "1.csv" -> "id1,1,False,\"line1\nline2\"\n"))
    val df = CdmSource.readEntity(spark, s"$root/2024-01-01T00.00.00Z", "acct", schema)
    assert(df.select("payload").as[String].head() == "line1\nline2")
  }
}
