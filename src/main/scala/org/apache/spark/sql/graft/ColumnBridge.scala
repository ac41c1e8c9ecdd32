package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark 4's `private[sql]` Column<->Expression
  * converters (the classic-mode seam left by the Spark Connect
  * refactor). Keeping it in the org.apache.spark.sql namespace is the
  * standard library technique for registering custom Catalyst
  * expressions without a fork.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
