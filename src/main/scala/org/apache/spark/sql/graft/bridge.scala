package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression conversion
  * (Spark 4.x split Column onto ColumnNode; classic conversions live behind
  * package-private API). Standard extension-library pattern: one tiny file
  * inside the org.apache.spark.sql package, everything else stays in graft.*.
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
