package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for Spark 4 (where Column wraps
  * a ColumnNode, not an Expression). Lives under org.apache.spark.sql
  * to reach the private[sql] ExpressionUtils — the standard pattern for
  * libraries extending Spark with native expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
