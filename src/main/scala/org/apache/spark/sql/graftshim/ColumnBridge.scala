package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column(Expression) constructor; the
  * supported bridge (`classic.ExpressionUtils`) is private[sql]. This
  * shim lives under org.apache.spark.sql solely to re-export the two
  * conversions needed to expose custom Catalyst expressions as Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
