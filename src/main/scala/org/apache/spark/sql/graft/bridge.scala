package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made `Column` wrap a ColumnNode and
  * scoped the conversion helpers `private[sql]`, so this one-file shim lives
  * in the org.apache.spark.sql namespace — the standard extension seam for
  * libraries contributing native expressions. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
