package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package bridge to the classic runtime's Column⇄Expression converters
  * (`private[sql]` in Spark 4 — same access pattern as the extensions
  * bridge the build already uses for session-injected functions). Needed
  * to attach constructor-parameterized expressions (e.g.
  * [[graft.expressions.NearestCellCos]], which carries a driver-collected
  * centroid matrix) that cannot go through the string-based function
  * registry. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
