package graft.streaming

import graft.core.SchemaEvolution
import graft.operators.{CdcMerge, MergeDialect}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Merge-key-bucketed catalog target: the 100 TB shape of the CDC sink.
  *
  * A plain parquet target makes every merge shuffle BOTH sides on the merge
  * key; bucketing the target by that key (`bucketBy` + `sortBy` in the
  * session catalog — same mechanics as Iceberg's bucket partition transform)
  * lets Spark read the target pre-partitioned: the sort-merge join plans NO
  * exchange on the target side, so per-batch shuffle cost is proportional to
  * the CHANGE SET, not the table. `MergePlanInspector.targetSideExchanges`
  * asserts that property in tests instead of trusting folklore.
  *
  * Writes go through `insertInto`-style overwrite of the bucketed table —
  * each commit rewrites buckets with Spark's bucketed writer, keeping the
  * invariant for the next merge.
  */
final class BucketedTarget(spark: SparkSession, val tableName: String,
                           keyColumn: String, numBuckets: Int) {

  def exists: Boolean = spark.catalog.tableExists(tableName)

  def read(): DataFrame = spark.table(tableName)

  /** Create or fully replace the bucketed table from a frame. */
  def overwrite(df: DataFrame): Unit = {
    if (exists) spark.sql(s"DROP TABLE $tableName")
    df.write
      .bucketBy(numBuckets, keyColumn)
      .sortBy(keyColumn)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Version-guarded CDC merge into the bucketed table. `changes` must be
    * deduplicated per key. The merged result lands bucketed again.
    */
  def merge(changes: DataFrame, dialect: MergeDialect): Unit = {
    val current = read()
    val evolved = SchemaEvolution.evolve(current.schema, changes.schema)
    val merged = CdcMerge.applyChanges(
      CdcMerge.alignTo(current, evolved), CdcMerge.alignTo(changes, evolved),
      keyColumn, dialect)
    // materialize before the table swap (can't overwrite a table being read)
    val staged = merged.localCheckpoint(eager = true)
    try overwrite(staged) finally graft.core.Checkpoints.release(staged)
  }
}

/** Plan inspection helpers for shuffle accounting in tests and tuning. */
object MergePlanInspector {

  /** Count ShuffleExchange operators in the executed plan. */
  def exchanges(df: DataFrame): Int =
    "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  /** Count exchanges whose subtree contains the given table's scan — 0 on a
    * correctly bucketed target side.
    */
  def targetSideExchanges(df: DataFrame, tableName: String): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scanOf(p: SparkPlan): Boolean =
      p.toString.contains(tableName)
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case e: ShuffleExchangeLike if scanOf(e.child) => 1
        case _ => 0
      }
      self + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
