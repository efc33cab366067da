package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MSSQL change-tracking source: query generators + partitioned-read wiring.
  *
  * The relational shape mirrors the reference's delta query
  * (/root/reference/src/main/resources/get_select_delta_query.sql:1-6 and
  * services/mssql/QueryProvider.scala:244-269): `CHANGETABLE(CHANGES t, v)`
  * RIGHT JOIN base table, emitting PKs, SYS_CHANGE_VERSION,
  * SYS_CHANGE_OPERATION, the data columns and a server-side computed
  * lowercase-hex SHA-256 ARCANE_MERGE_KEY.
  *
  * These are pure string builders (unit-testable with no database); at run
  * time they feed `spark.read.jdbc` — the backfill variant with per-shard
  * `ABS(CHECKSUM(pk)) % N = i` predicates, giving N parallel JDBC partitions
  * WITHOUT the reference's server-side shard-table copies (S3): Spark's
  * partitioned read replaces materialization.
  */
object MsSqlChangeTracking {

  /** Server-side merge-key expression (get_select_delta_query.sql:4). */
  def mergeKeySql(pkColumns: Seq[String], tableAlias: String = "tq"): String = {
    val concat = pkColumns
      .map(c => s"CAST($tableAlias.[$c] AS NVARCHAR(128))")
      .mkString(" + '#' + ")
    s"LOWER(CONVERT(NVARCHAR(128), HASHBYTES('SHA2_256', $concat), 2))"
  }

  /** Delta query: changes since `fromVersion` (exclusive), reference queries
    * `latestVersion - 1` inclusive — the -1 adjustment from
    * MsSqlStreamingSource.scala:179 is the caller's contract here: pass the
    * committed watermark version verbatim.
    */
  def deltaQuery(schema: String, table: String, pkColumns: Seq[String],
                 dataColumns: Seq[String], fromVersion: Long): String = {
    // one filtered join, never string interpolation of possibly-empty
    // fragments: a pure link/junction table (every column in the PK) has
    // dataColumns = Nil, and a `$dataSel,` template would emit a dangling
    // comma — a server-side syntax error at run time
    val sel = (pkColumns.map(c => s"ct.[$c]") ++
      Seq("ct.SYS_CHANGE_VERSION", "ct.SYS_CHANGE_OPERATION") ++
      dataColumns.map(c => s"tq.[$c]")).mkString(", ")
    s"""SELECT $sel,
       |  ${mergeKeySql(pkColumns, "ct")} AS ARCANE_MERGE_KEY
       |FROM CHANGETABLE(CHANGES [$schema].[$table], $fromVersion) AS ct
       |LEFT JOIN [$schema].[$table] AS tq ON ${pkColumns.map(c => s"ct.[$c] = tq.[$c]").mkString(" AND ")}""".stripMargin
  }

  /** Full-scan backfill query with synthetic CDC columns
    * (get_select_all_query.sql:1-8): version 0, operation 'I'.
    */
  def backfillQuery(schema: String, table: String, pkColumns: Seq[String],
                    dataColumns: Seq[String]): String = {
    val sel = (pkColumns ++ dataColumns).map(c => s"tq.[$c]").mkString(", ")
    s"""SELECT $sel, CAST(0 AS BIGINT) AS SYS_CHANGE_VERSION,
       |  'I' AS SYS_CHANGE_OPERATION,
       |  ${mergeKeySql(pkColumns)} AS ARCANE_MERGE_KEY
       |FROM [$schema].[$table] AS tq""".stripMargin
  }

  /** Shard count from the reference's cost model: clamp(1 + ln(cost)³, 1,
    * 1000) (QueryProvider.scala:169-174) — cost from SET STATISTICS PROFILE
    * EstimateIO + EstimateCPU sums.
    */
  def shardCountFromCost(cost: Double): Int = {
    if (cost <= 1.0) 1
    else math.min(1000, math.max(1, (1.0 + math.pow(math.log(cost), 3)).toInt))
  }

  /** Optimizer-cost probe: `SET STATISTICS PROFILE` around a `TOP 1` scan
    * (ref QueryProvider.scala:163-167). The caller sums the plan rows'
    * EstimateIO + EstimateCPU columns into the `cost` fed to
    * [[costToShardSize]] / [[physicalStatsQuery]].
    */
  def statsProfileQuery(schema: String, table: String): String =
    s"""EXEC('
       | SET STATISTICS PROFILE ON;
       | SELECT TOP 1 * FROM [$schema].[$table];
       | SET STATISTICS PROFILE OFF')""".stripMargin

  /** Target shard size in MiB from optimizer cost — the reference's
    * `costToSize`: clamp(1 + ln(cost)³, 1, 1000) (QueryProvider.scala:169-174).
    * Cheaper plans → smaller clamp → more, smaller shards is avoided; pricier
    * plans cap at 1000 MiB shards.
    */
  def costToShardSize(cost: Double): Double = {
    val c = 1.0 + math.pow(math.log(cost), 3)
    // clamp to the documented [1, 1000] band — `c < 0` alone would let
    // costs in (1/e, 1) produce sub-1-MiB shard sizes below the floor
    // (and ~50% more shards than the model intends), inconsistent with
    // shardCountFromCost's cost <= 1 → 1 handling
    if (c < 1) 1.0 else if (c > 1000) 1000.0 else c
  }

  /** Physical-stats query over the clustered index leaf level
    * (`sys.dm_db_index_physical_stats ... index_level = 0`, ref
    * QueryProvider.scala:176-186): total size in GiB, shard count at the
    * cost-derived shard size, and records per shard — the inputs the
    * reference's shard creator reads before backfilling.
    */
  def physicalStatsQuery(schema: String, table: String, cost: Double): String =
    physicalStatsQuerySized(schema, table, costToShardSize(cost))

  /** [[physicalStatsQuery]] with an explicit shard size in MiB (ref
    * QueryProvider.scala:188-196 — the operator-override path).
    */
  def physicalStatsQuerySized(schema: String, table: String, shardSizeMib: Double): String =
    // the shard divisor floors at 1: an empty/truncated table has
    // page_count = 0 → ceiling(0/size) = 0 → the records_per_shard
    // division would raise SQL Server error 8134 and fail backfill
    // planning instead of reporting a 1-shard empty table
    s"""SELECT
       |    (page_count * 8.0) / 1024 / 1024 as total_size_gib,
       |    CASE WHEN page_count = 0 THEN 1
       |         ELSE ceiling((page_count * 8.0) / 1024 / $shardSizeMib) END as shards,
       |    record_count / CASE WHEN page_count = 0 THEN 1
       |         ELSE ceiling((page_count * 8.0) / 1024 / $shardSizeMib) END as records_per_shard
       |FROM
       |    sys.dm_db_index_physical_stats(DB_ID(), OBJECT_ID('$schema.$table'), 1, NULL, 'DETAILED')
       |where index_level = 0""".stripMargin

  /** Client-side mirror of [[physicalStatsQuery]]'s shards column, for
    * callers that already hold leaf page counts (8 KiB pages): shard count
    * at the cost-derived size, clamped to [1, 1000] like the server-side
    * ceiling path.
    */
  def shardCountFromStats(leafPageCount: Long, cost: Double): Int = {
    val sizeMib = leafPageCount * 8.0 / 1024
    val n = math.ceil(sizeMib / costToShardSize(cost)).toInt
    math.min(1000, math.max(1, n))
  }

  /** Per-shard JDBC predicates (`%N=i` over PK checksum) — one Spark input
    * partition each; the server evaluates the checksum, the rows never
    * co-locate on one connection.
    */
  def shardPredicates(pkColumns: Seq[String], numShards: Int): Array[String] =
    // one predicate template for the whole engine: MergeKey owns it, so a
    // future fix (NULL-checksum handling, skew salt) lands everywhere
    graft.core.MergeKey.mssqlShardPredicates(
      pkColumns.map(c => s"[$c]").mkString(", "), numShards)

  /** Partitioned backfill read: the full table pulled over numShards parallel
    * JDBC connections.
    */
  def readBackfill(spark: SparkSession, jdbcUrl: String, props: java.util.Properties,
                   schema: String, table: String, pkColumns: Seq[String],
                   dataColumns: Seq[String], numShards: Int): DataFrame = {
    val q = s"(${backfillQuery(schema, table, pkColumns, dataColumns)}) AS backfill"
    spark.read.jdbc(jdbcUrl, q, shardPredicates(pkColumns, numShards), props)
  }

  /** Version ↔ time bridge queries (reference MsSqlStreamingSource.scala:
    * 222-267, QueryProvider.scala:200-207): map a backfill start timestamp
    * to the first change-tracking version at-or-after it, with the
    * documented caveat that `sys.dm_tran_commit_table` can lag — callers
    * fall back to the current version when the scalar comes back NULL.
    */
  def timestampToVersionQuery(isoTimestamp: String): String =
    s"""SELECT MIN(commit_ts) FROM sys.dm_tran_commit_table
       |WHERE commit_time >= '$isoTimestamp'""".stripMargin

  def versionToTimestampQuery(version: Long): String =
    s"""SELECT MIN(commit_time) FROM sys.dm_tran_commit_table
       |WHERE commit_ts >= $version""".stripMargin

  /** `TOP 1` change-existence probe (reference hasChanges,
    * MsSqlStreamingSource.scala:333-337): cheap guard before planning a
    * batch pull.
    */
  def hasChangesQuery(schema: String, table: String, fromVersion: Long): String =
    s"SELECT TOP 1 1 FROM CHANGETABLE(CHANGES [$schema].[$table], $fromVersion) AS ct"

  /** Delta read for one micro-batch (changes in (fromVersion, toVersion]). */
  def readDelta(spark: SparkSession, jdbcUrl: String, props: java.util.Properties,
                schema: String, table: String, pkColumns: Seq[String],
                dataColumns: Seq[String], fromVersion: Long): DataFrame = {
    val q = s"(${deltaQuery(schema, table, pkColumns, dataColumns, fromVersion)}) AS delta"
    spark.read.jdbc(jdbcUrl, q, props)
  }
}
