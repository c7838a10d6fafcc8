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

  /** Eagerly converts the Column's node tree into a real Catalyst
    * expression (the lazy [[expression]] wrapper renders as an opaque
    * `columnnodeexpression(...)` under `.sql`, which no SQL parser can read
    * back). Used wherever a Column must be SERIALIZED as SQL text — e.g.
    * DLT-expectation rendering — rather than merely planned. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
