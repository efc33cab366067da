package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

class MsSqlChangeTrackingSpec extends SparkSpec {

  test("delta query shape: CHANGETABLE join, CDC columns, merge key") {
    val q = MsSqlChangeTracking.deltaQuery("dbo", "t", Seq("x"), Seq("y", "z"), 42L)
    assert(q.contains("CHANGETABLE(CHANGES [dbo].[t], 42)"))
    assert(q.contains("ct.SYS_CHANGE_VERSION"))
    assert(q.contains("ct.SYS_CHANGE_OPERATION"))
    assert(q.contains("HASHBYTES('SHA2_256'"))
    assert(q.contains("LEFT JOIN [dbo].[t] AS tq ON ct.[x] = tq.[x]"))
  }

  test("backfill query synthesizes version 0 and operation I") {
    val q = MsSqlChangeTracking.backfillQuery("dbo", "t", Seq("x"), Seq("y"))
    assert(q.contains("CAST(0 AS BIGINT) AS SYS_CHANGE_VERSION"))
    assert(q.contains("'I' AS SYS_CHANGE_OPERATION"))
  }

  test("shard count follows clamp(1+ln(cost)^3, 1, 1000)") {
    assert(MsSqlChangeTracking.shardCountFromCost(0.5) == 1)
    assert(MsSqlChangeTracking.shardCountFromCost(math.exp(2)) == 9) // 1+2^3
    assert(MsSqlChangeTracking.shardCountFromCost(1e60) == 1000)
  }

  test("shard predicates partition the keyspace") {
    val preds = MsSqlChangeTracking.shardPredicates(Seq("x", "y"), 3)
    assert(preds.length == 3)
    assert(preds(0) == "ABS(CAST(CHECKSUM([x], [y]) AS BIGINT)) % 3 = 0")
  }

  test("stats-profile probe wraps a TOP 1 scan in SET STATISTICS PROFILE") {
    val q = MsSqlChangeTracking.statsProfileQuery("dbo", "t")
    assert(q.contains("SET STATISTICS PROFILE ON;"))
    assert(q.contains("SELECT TOP 1 * FROM [dbo].[t];"))
    assert(q.contains("SET STATISTICS PROFILE OFF"))
    assert(q.startsWith("EXEC('"))
  }

  test("physical-stats query derives shards from leaf pages at the cost-sized divisor") {
    val q = MsSqlChangeTracking.physicalStatsQuery("dbo", "t", cost = math.exp(2))
    // costToShardSize(e^2) = 1 + 2^3 = 9 MiB per shard
    assert(q.contains("ceiling((page_count * 8.0) / 1024 / 9.0) END as shards"))
    // empty-table guard: page_count = 0 must not reach the division
    // (SQL Server error 8134 would fail backfill planning)
    assert(q.contains("CASE WHEN page_count = 0 THEN 1"))
    assert(q.contains("sys.dm_db_index_physical_stats(DB_ID(), OBJECT_ID('dbo.t'), 1, NULL, 'DETAILED')"))
    assert(q.contains("index_level = 0"))
    assert(MsSqlChangeTracking.costToShardSize(0.1) == 1.0)   // 1+ln³ < 0 clamps to 1
    // the documented [1, 1000] FLOOR bites in (1/e, 1) too — a 0.667 MiB
    // shard size would plan ~50% more JDBC shards than the model intends
    assert(MsSqlChangeTracking.costToShardSize(0.5) == 1.0)
    assert(MsSqlChangeTracking.costToShardSize(1e60) == 1000.0)
  }

  test("a pure-PK table (no data columns) renders valid delta SQL") {
    // a link/junction table where every column is in the PK: the SELECT
    // list must not carry a dangling comma from an empty data segment
    val q = MsSqlChangeTracking.deltaQuery("dbo", "link", Seq("a", "b"), Nil, 5L)
    assert(!q.contains(", ,") && !q.contains(",,"))
    assert(q.contains("ct.[a], ct.[b], ct.SYS_CHANGE_VERSION, ct.SYS_CHANGE_OPERATION,"))
  }

  test("client-side shard count mirrors the server ceiling") {
    // 9216 leaf pages = 72 MiB; at e^2 cost → 9 MiB shards → 8 shards
    assert(MsSqlChangeTracking.shardCountFromStats(9216, math.exp(2)) == 8)
    assert(MsSqlChangeTracking.shardCountFromStats(0, 10.0) == 1)      // clamp low
    assert(MsSqlChangeTracking.shardCountFromStats(Long.MaxValue / 16, 1.1) == 1000) // clamp high
  }
}

class JdbcTypeMapSpec extends SparkSpec {
  import java.sql.Types

  test("MSSQL TIME maps to Spark TimeType with capped precision") {
    assert(JdbcTypeMap.toSparkType(Types.TIME, precision = 7) == TimeType(6))
    assert(JdbcTypeMap.toSparkType(Types.TIME, precision = 3) == TimeType(3))
  }

  test("reference type table parity") {
    assert(JdbcTypeMap.toSparkType(Types.BIGINT) == LongType)
    assert(JdbcTypeMap.toSparkType(Types.BIT) == BooleanType)
    assert(JdbcTypeMap.toSparkType(Types.LONGNVARCHAR) == StringType) // ntext
    assert(JdbcTypeMap.toSparkType(Types.TIMESTAMP) == TimestampNTZType)
    assert(JdbcTypeMap.toSparkType(Types.TIMESTAMP_WITH_TIMEZONE) == TimestampType)
    assert(JdbcTypeMap.toSparkType(Types.NUMERIC, 10, 2) == DecimalType(10, 2))
    assert(JdbcTypeMap.toSparkType(Types.REAL) == FloatType)
    assert(JdbcTypeMap.toSparkType(Types.TINYINT) == ShortType)
    assert(JdbcTypeMap.toSparkType(Types.VARBINARY) == BinaryType)
    intercept[IllegalArgumentException](JdbcTypeMap.toSparkType(Types.SQLXML))
  }
}

class CdmSourceSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("cdm type mapping mirrors the reference (decimal→double!)") {
    assert(CdmSource.cdmTypeToSpark("guid") == StringType)
    assert(CdmSource.cdmTypeToSpark("int64") == LongType)
    assert(CdmSource.cdmTypeToSpark("decimal") == DoubleType)
    assert(CdmSource.cdmTypeToSpark("dateTime") == TimestampNTZType)
    assert(CdmSource.cdmTypeToSpark("dateTimeOffset") == TimestampType)
    assert(CdmSource.cdmTypeToSpark("mystery") == StringType)
  }

  test("model.json schema extraction for one entity") {
    val model =
      """{"entities":[
        |{"$type":"LocalEntity","name":"other","attributes":[{"name":"zz","dataType":"string"}]},
        |{"$type":"LocalEntity","name":"acct","attributes":[
        |  {"name":"Id","dataType":"guid"},
        |  {"name":"versionnumber","dataType":"int64"},
        |  {"name":"IsDelete","dataType":"boolean"}]}
        |]}""".stripMargin
    val schema = CdmSource.schemaFromModelJson(model, "acct")
    assert(schema.fieldNames.toSeq == Seq("Id", "versionnumber", "IsDelete"))
    assert(schema("versionnumber").dataType == LongType)
    intercept[IllegalArgumentException] {
      CdmSource.schemaFromModelJson(model, "missing")
    }
  }

  test("timestamp dialects: Sink* uses M/d/yyyy, others ISO with Z variants") {
    val df = Seq(("6/12/2024 3:04:05 PM", "2024-06-12T15:04:05.1234567Z",
      "2024-06-12T15:04:05Z")).toDF("sink", "frac", "zulu")
    val out = df.select(
      CdmSource.parseCdmTimestamp("SinkCreatedOn", col("sink")).as("a"),
      CdmSource.parseCdmTimestamp("modifiedon", col("frac")).as("b"),
      CdmSource.parseCdmTimestamp("modifiedon", col("zulu")).as("c")).head()
    assert(!out.isNullAt(0) && !out.isNullAt(1) && !out.isNullAt(2))
    assert(out.getTimestamp(0).toString.startsWith("2024-06-12 15:04:05"))
  }

  test("deletes-last ordering: _file_seq ranks 2.csv before 1.csv") {
    val dir = Files.createTempDirectory("cdm").toString
    val entityDir = Paths.get(dir, "2024-01-01T00.00.00Z", "acct")
    Files.createDirectories(entityDir)
    // 2.csv carries the insert, 1.csv the later delete-marked row
    Files.writeString(entityDir.resolve("2.csv"), "id1,1,False\n")
    Files.writeString(entityDir.resolve("1.csv"), "id1,2,True\n")
    val schema = StructType(Seq(
      StructField("Id", StringType), StructField("versionnumber", LongType),
      StructField("IsDelete", BooleanType)))
    val df = CdmSource.readEntity(spark, s"$dir/2024-01-01T00.00.00Z", "acct", schema)
    val rows = df.orderBy(col("_file_seq")).collect()
    assert(rows.length == 2)
    // 2.csv gets seq -2, 1.csv gets seq -1: delete (1.csv) sorts last
    val bySeq = rows.map(r => (r.getAs[Long]("_file_seq"), r.getAs[Boolean]("IsDelete")))
    assert(bySeq.maxBy(_._1)._2) // highest seq = the delete row
  }

  test("folder listing prunes in-progress and already-seen folders") {
    val dir = Files.createTempDirectory("cdmroot").toString
    Seq("2024-01-01T00.00.00Z", "2024-01-01T01.00.00Z", "2024-01-01T02.00.00Z", "junk")
      .foreach(n => Files.createDirectories(Paths.get(dir, n)))
    val got = CdmSource.listBatchFolders(spark, dir,
      afterFolder = Some("2024-01-01T00.00.00Z"),
      inProgress = Some("2024-01-01T02.00.00Z"))
    assert(got == Seq("2024-01-01T01.00.00Z"))
  }

  test("changelog.info gates the in-progress folder until the writer advances it") {
    val dir = Files.createTempDirectory("cdmroot2").toString
    Seq("2024-01-01T00.00.00Z", "2024-01-01T01.00.00Z")
      .foreach(n => Files.createDirectories(Paths.get(dir, n)))
    // writer announces 01.00.00Z as in progress
    Files.createDirectories(Paths.get(dir, "Changelog"))
    Files.writeString(Paths.get(dir, "Changelog", "changelog.info"), "2024-01-01T01.00.00Z\n")
    assert(CdmSource.readInProgressFolder(spark, dir).contains("2024-01-01T01.00.00Z"))
    assert(CdmSource.listCompleteBatchFolders(spark, dir, None)
      == Seq("2024-01-01T00.00.00Z"), "in-progress folder must be excluded")
    // writer finishes the batch and moves on to the next hour
    Files.writeString(Paths.get(dir, "Changelog", "changelog.info"), "2024-01-01T02.00.00Z")
    assert(CdmSource.listCompleteBatchFolders(spark, dir, None)
      == Seq("2024-01-01T00.00.00Z", "2024-01-01T01.00.00Z"),
      "folder becomes eligible once the changelog advances past it")
    // no changelog file → everything listed is eligible
    Files.delete(Paths.get(dir, "Changelog", "changelog.info"))
    assert(CdmSource.listCompleteBatchFolders(spark, dir, None)
      == Seq("2024-01-01T00.00.00Z", "2024-01-01T01.00.00Z"))
  }
}

class BlobListingSpec extends SparkSpec {
  import spark.implicits._

  test("listing filters by mod time and skips hidden/meta files") {
    val dir = Files.createTempDirectory("blobs").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/d1")
    val (files, maxMod, boundary) =
      BlobListingSource.listNewFiles(spark, dir, Long.MinValue)
    assert(files.nonEmpty)
    assert(files.forall(f => !f.contains("_SUCCESS")))
    // re-listing WITH the committed boundary set yields nothing new; the
    // inclusive timestamp alone (empty boundary) would re-admit the
    // boundary files — that asymmetry is what catches late arrivals
    val (none, sameMod, b2) =
      BlobListingSource.listNewFiles(spark, dir, maxMod, boundary.toSet)
    assert(none.isEmpty && sameMod == maxMod && b2.toSet == boundary.toSet)
  }

  test("a file surfacing late with the committed boundary timestamp is still read") {
    // blob mod times are coarse (often 1 s): a file stamped the SAME
    // millisecond as the committed watermark but listed only after the
    // batch (eventual consistency / in-flight write) must be picked up by
    // the next poll — the strict-`>` filter this replaces skipped it
    // forever, silent data loss
    val dir = Files.createTempDirectory("blobs-late").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/d1")
    val cfg = BlobSourceConfig(dir, pkColumns = Seq("id"))
    val Some((b1, wm1)) = BlobListingSource.nextBatch(spark, cfg, None)
    assert(b1.count() == 1)
    // the "late" file: written after the batch, mod time pinned to the
    // committed watermark's exact timestamp
    Seq((2L, "late")).toDF("id", "v").write.parquet(s"$dir/d2")
    val (t, _) = graft.core.Watermark.blobParts(wm1.version).get
    Files.walk(Paths.get(dir, "d2")).forEach(p => p.toFile.setLastModified(t))
    val Some((b2, wm2)) = BlobListingSource.nextBatch(spark, cfg, Some(wm1))
    assert(b2.select("id").collect().map(_.getLong(0)).toSet == Set(2L),
      "the same-timestamp late file must be read, and only it")
    // and the stream quiesces: nothing new → None, no busy re-read loop
    assert(BlobListingSource.nextBatch(spark, cfg, Some(wm2)).isEmpty)
  }

  test("ORC and text blob feeds batch end-to-end like parquet") {
    // ORC: Spark-native columnar alternative — same listing, same
    // enrichment, same watermark progression
    val orcDir = Files.createTempDirectory("blobs-orc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.orc(s"$orcDir/d1")
    val orcCfg = BlobSourceConfig(orcDir, format = "orc", pkColumns = Seq("id"))
    val Some((ob, owm)) = BlobListingSource.nextBatch(spark, orcCfg, None)
    assert(ob.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(ob.columns.contains("ARCANE_MERGE_KEY") && ob.columns.contains("createdon"))
    assert(BlobListingSource.nextBatch(spark, orcCfg, Some(owm)).isEmpty)

    // text: one `value` column per line; the whole-row merge-key default
    // fingerprints the line itself
    val txtDir = Files.createTempDirectory("blobs-txt").toString
    Files.createDirectories(Paths.get(txtDir, "d1"))
    Files.writeString(Paths.get(txtDir, "d1", "part-0.txt"), "alpha\nbeta\n")
    val txtCfg = BlobSourceConfig(txtDir, format = "text")
    val Some((tb, _)) = BlobListingSource.nextBatch(spark, txtCfg, None)
    val lines = tb.select("value").collect().map(_.getString(0)).toSet
    assert(lines == Set("alpha", "beta"))
    assert(tb.select("ARCANE_MERGE_KEY").distinct().count() == 2,
      "distinct lines must carry distinct whole-row merge keys")
  }

  test("an overflow-marked boundary degrades to exclusive; a full non-marked one does not") {
    // 1-file fixture standing in for a timestamp shared by >cap−1 files:
    // the OVERFLOW MARKER (written by blobWithBoundary when it truncates)
    // must suppress re-admission at the boundary timestamp, while a
    // boundary of cap−1 REAL hashes — complete information — must keep the
    // inclusive late-arrival semantics
    val dir = Files.createTempDirectory("blobs-overflow").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/d1")
    val (files, maxMod, _) = BlobListingSource.listNewFiles(spark, dir, Long.MinValue)
    assert(files.nonEmpty)
    // marker boundary: exclusive — the same-timestamp file is NOT re-read
    val (none, _, carried) = BlobListingSource.listNewFiles(
      spark, dir, maxMod, Set(graft.core.Watermark.BlobBoundaryOverflow))
    assert(none.isEmpty, "overflowed boundary must not re-admit boundary files")
    assert(carried.contains(graft.core.Watermark.BlobBoundaryOverflow),
      "the overflow marker must carry forward while the timestamp holds")
    // cap−1 real hashes (none matching): inclusive — the file IS admitted
    val fullSet = (0 until graft.core.Watermark.BlobBoundaryCap - 1)
      .map(i => f"$i%08x").toSet
    val (admitted, _, _) = BlobListingSource.listNewFiles(spark, dir, maxMod, fullSet)
    assert(admitted == files,
      "a complete (non-marked) boundary keeps inclusive late-arrival semantics")
  }

  test("a wrong-kind or corrupt watermark fails loudly instead of re-reading the prefix") {
    val dir = Files.createTempDirectory("blobs-wm").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/d1")
    val cfg = BlobSourceConfig(dir, pkColumns = Seq("id"))
    intercept[IllegalArgumentException] {
      BlobListingSource.nextBatch(spark, cfg,
        Some(graft.core.Watermark.mssql(5L)))
    }
    intercept[IllegalStateException] {
      BlobListingSource.nextBatch(spark, cfg,
        Some(graft.core.Watermark("blob-source", "not-a-number", 0L)))
    }
  }

  test("pre-configured schema overrides footer inference on mismatched files") {
    val dir = Files.createTempDirectory("blobs-override").toString
    // producer drift: first file lacks the `extra` column the stream declares
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/d1")
    Seq((2L, "b", 9L)).toDF("id", "v", "extra").write.parquet(s"$dir/d2")

    val declared = BlobListingSource.BlobSchema.fromDdl("id BIGINT, v STRING, extra BIGINT")
    val cfg = BlobSourceConfig(dir, pkColumns = Seq("id"), sourceSchema = Some(declared))
    val Some((batch, _)) = BlobListingSource.nextBatch(spark, cfg, None)
    val rows = batch.select("id", "v", "extra").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", Some(9L))),
      "missing columns must read as NULL under the declared schema")
    assert(batch.schema("extra").dataType == LongType)
  }

  test("Base64-parquet schema payload decodes to the footer schema") {
    val dir = Files.createTempDirectory("blobs-b64").toString
    Seq((1L, "x", 2.5)).toDF("id", "name", "score").write.parquet(s"$dir/sample")
    val parquetFile = Files.list(Paths.get(s"$dir/sample")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val b64 = java.util.Base64.getEncoder.encodeToString(
      Files.readAllBytes(Paths.get(parquetFile)))
    val schema = BlobListingSource.BlobSchema.fromBase64Parquet(spark, b64)
    assert(schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(schema("score").dataType == DoubleType)
  }
}
