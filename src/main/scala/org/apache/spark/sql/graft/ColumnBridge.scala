package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters, so the
  * engine's custom Catalyst expressions (graft.functions.expressions.*) can
  * surface as ordinary `Column`s. Lives in the org.apache.spark.sql package
  * by design — the documented pattern for Catalyst-level extensions that
  * don't go through SparkSessionExtensions registration.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into `private[sql]` Dataset construction from a logical plan, so
  * engine components that PARSE SQL (e.g. the MERGE INTO interpreter) can
  * turn sub-plans back into DataFrames and let the analyzer resolve temp
  * views and expressions the normal way.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Bridge into `private[spark]` listener-bus draining: QueryExecutionListener
  * delivery is asynchronous (ExecutionListenerBus on the shared bus), so a
  * spec — or a metrics exporter flushing at shutdown — that reads
  * listener-written state right after an action needs a deterministic drain
  * instead of a sleep.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(spark: org.apache.spark.sql.SparkSession,
                                timeoutMillis: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
}
