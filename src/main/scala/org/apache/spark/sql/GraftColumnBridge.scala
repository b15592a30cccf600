package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion for graft's
  * native Catalyst expressions (Spark 4 wraps Column around ColumnNode;
  * classic.ExpressionUtils is the supported internal path). Keeping the
  * bridge to these two calls bounds our internal-API surface. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
