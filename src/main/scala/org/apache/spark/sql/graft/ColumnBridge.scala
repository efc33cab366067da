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
