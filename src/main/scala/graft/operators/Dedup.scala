package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup-latest: keep the newest version of each merge key inside a batch.
  *
  * This is the reference's `reduceExpr` subquery — `ROW_NUMBER() OVER
  * (PARTITION BY ARCANE_MERGE_KEY ORDER BY <version> DESC) ... FETCH FIRST 1
  * ROWS WITH TIES` (/root/reference/src/main/scala/models/batches/
  * SqlServerChangeTracking.scala:77-80, SynapseLink.scala:76-80,
  * UpsertBlob.scala:66-70) — as a native window operator.
  *
  * Scale note: the window shuffles once on the key. That shuffle is
  * unavoidable for a global dedup, and it is the SAME partitioning the
  * downstream merge join needs, so Catalyst reuses it (no second exchange) —
  * at 100 TB the batch dedup + merge costs one exchange total on the key.
  */
object Dedup {

  /** Keep exactly one row per key: highest version wins, ties broken
    * deterministically by `tieBreakers` (appended descending). This is the
    * recommended dialect — `row_number` never duplicates a key, so a
    * downstream MERGE can never hit the "multiple source rows match" error
    * that WITH-TIES semantics would trigger (SURVEY §7.4).
    */
  def latestByKey(df: DataFrame, key: Column, version: Seq[Column],
                  tieBreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy((version ++ tieBreakers).map(_.desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Faithful WITH-TIES variant: keeps every row sharing the max version per
    * key (`rank() = 1`), matching the reference's `FETCH FIRST 1 ROWS WITH
    * TIES` exactly. Use only when downstream tolerates duplicate keys.
    */
  def latestByKeyWithTies(df: DataFrame, key: Column, version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(version.map(_.desc): _*)
    df.withColumn("__graft_rk", rank().over(w))
      .filter(col("__graft_rk") === 1)
      .drop("__graft_rk")
  }

  /** Exact whole-row duplicate removal over arbitrary columns, keeping the
    * smallest `keep` value (deterministic representative). Used by the
    * documents exact-dedup path: group on content hash rather than raw text so
    * the shuffle keys are 32 bytes, not document bodies.
    */
  def exactByColumns(df: DataFrame, groupCols: Seq[Column], keep: Column): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(keep.asc)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }
}
