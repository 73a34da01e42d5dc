package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal package-located bridge to the sql-private Column↔Expression
  * converters (Spark 4 wraps Column around ColumnNode; the classic
  * converters are `private[sql]`). This is the conventional shim used by
  * Spark extension libraries to expose custom Catalyst expressions as
  * `Column`s.
  */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
