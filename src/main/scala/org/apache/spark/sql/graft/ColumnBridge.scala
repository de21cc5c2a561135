package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and catalyst `Expression` for Spark 4, where
  * the converters are `private[sql]`. Lives inside the sql package —
  * the same pattern public Spark extension libraries use to expose
  * custom catalyst expressions as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
