package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end execution of the [[MergeSqlBuilder]] SQL strings — the round-3
  * gap: the generated MERGE text was golden-tested but nothing ever ran it.
  * Here each dialect's statement is parsed by Spark, interpreted by
  * [[MergeSqlExecutor]] against temp views over the same events-as-CDC
  * fixtures the oracle-checked m2/m3/m4 queries use, and the result is
  * asserted row-identical to the [[CdcMerge]] DataFrame path (which the
  * DuckDB oracle already vouches for).
  */
class MergeSqlExecutorSpec extends SparkSpec {

  private val pivot = 2000L

  private def events: DataFrame = {
    val df = spark.read.parquet(s"$sf/events.parquet")
    val ts = if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz") else col("ts")
    df.select(col("user_id"), col("event_id"), ts.as("ts"), col("event_type"), col("value"))
  }

  private def target(verCol: String): DataFrame =
    Dedup.latestByKey(
      events.filter(col("event_id") < pivot).withColumn(verCol, col("event_id")),
      col("user_id"), Seq(col(verCol)))

  private def changes(verCol: String): DataFrame =
    events.filter(col("event_id") >= pivot).withColumn(verCol, col("event_id"))

  private val outCols = Seq("user_id", "event_id", "event_type", "value")

  private def rows(df: DataFrame): Seq[String] =
    df.select(outCols.map(col): _*).orderBy(col("user_id"))
      .collect().map(_.toString).toSeq

  private def assertSqlMatchesDataFrame(sql: String, expected: DataFrame): Unit = {
    val viaSql = MergeSqlExecutor.merged(spark, sql)
    assert(rows(viaSql).nonEmpty)
    assert(rows(viaSql) == rows(expected), "SQL MERGE path diverges from CdcMerge")
  }

  test("mssql-ct MERGE SQL executes and matches the m2 DataFrame dialect") {
    val tgt = target("SYS_CHANGE_VERSION")
    val chg = changes("SYS_CHANGE_VERSION")
      .withColumn("SYS_CHANGE_OPERATION",
        when(col("event_type") === "error", "D").otherwise("U"))
    tgt.createOrReplaceTempView("m2_target")
    chg.createOrReplaceTempView("m2_staged")

    val cols = tgt.columns.toSeq
    val sql = MergeSqlBuilder.mssqlCt("m2_target",
      MergeSqlBuilder.dedupSubquery("m2_staged", "user_id", "SYS_CHANGE_VERSION"),
      cols :+ MsSqlCtDialect.operationColumn, keyCol = "user_id")

    val latest = Dedup.latestByKey(chg, col("user_id"), Seq(col("SYS_CHANGE_VERSION")))
    val expected = CdcMerge.applyChanges(tgt, latest, "user_id", MsSqlCtDialect)
    assertSqlMatchesDataFrame(sql, expected)
  }

  test("synapse soft-delete MERGE SQL executes and matches the m3 dialect") {
    val tgt = target("versionnumber")
    val chg = changes("versionnumber")
      .withColumn("IsDelete", col("event_type") === "error")
    tgt.createOrReplaceTempView("m3_target")
    chg.createOrReplaceTempView("m3_staged")

    val sql = MergeSqlBuilder.synapseLink("m3_target",
      MergeSqlBuilder.dedupSubquery("m3_staged", "user_id", "versionnumber"),
      tgt.columns.toSeq, keyCol = "user_id")

    val latest = Dedup.latestByKey(chg, col("user_id"), Seq(col("versionnumber")))
    val expected = CdcMerge.applyChanges(tgt, latest, "user_id", SynapseLinkDialect)
    assertSqlMatchesDataFrame(sql, expected)
  }

  test("upsert-blob MERGE SQL executes and matches the m4 dialect") {
    val tgt = target("createdon")
    val chg = changes("createdon")
    tgt.createOrReplaceTempView("m4_target")
    chg.createOrReplaceTempView("m4_staged")

    val sql = MergeSqlBuilder.upsertBlob("m4_target",
      MergeSqlBuilder.dedupSubquery("m4_staged", "user_id", "createdon"),
      tgt.columns.toSeq, keyCol = "user_id")

    val latest = Dedup.latestByKey(chg, col("user_id"), Seq(col("createdon")))
    val expected = CdcMerge.applyChanges(tgt, latest, "user_id", UpsertBlobDialect)
    assertSqlMatchesDataFrame(sql, expected)
  }

  test("MERGE with extra NULL-tolerant match keys and partition pruning executes") {
    val tgt = target("versionnumber")
    val chg = changes("versionnumber")
      .withColumn("IsDelete", col("event_type") === "error")
    tgt.createOrReplaceTempView("m5_target")
    chg.createOrReplaceTempView("m5_staged")

    val sql = MergeSqlBuilder.synapseLink("m5_target",
      MergeSqlBuilder.dedupSubquery("m5_staged", "user_id", "versionnumber"),
      tgt.columns.toSeq, keyCol = "user_id",
      partitionPruning = Seq("event_type" -> Seq("click", "view", "purchase", "error")),
      extraMatchKeys = Seq("event_type"))
    // semantic smoke: executes, keeps the key-uniqueness invariant
    val out = MergeSqlExecutor.merged(spark, sql)
    val n = out.count()
    assert(n > 0 && out.select("user_id").distinct().count() == n)
  }

  test("executeIntoTempView swaps the target view to the merged state") {
    val tgt = target("createdon")
    val chg = changes("createdon")
    tgt.createOrReplaceTempView("m6_target")
    chg.createOrReplaceTempView("m6_staged")
    val sql = MergeSqlBuilder.upsertBlob("m6_target",
      MergeSqlBuilder.dedupSubquery("m6_staged", "user_id", "createdon"),
      tgt.columns.toSeq, keyCol = "user_id")
    val before = spark.table("m6_target").count()
    MergeSqlExecutor.executeIntoTempView(spark, sql)
    val after = spark.table("m6_target").count()
    assert(after >= before, "upserts never shrink the target")
    val latest = Dedup.latestByKey(chg, col("user_id"), Seq(col("createdon")))
    val expected = CdcMerge.applyChanges(tgt, latest, "user_id", UpsertBlobDialect)
    assert(rows(spark.table("m6_target")) == rows(expected))
  }
}
