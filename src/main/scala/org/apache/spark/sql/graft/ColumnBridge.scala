package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst `Expression` bridge for the library's native
  * expressions ([[graft.functions.ArrayMath]] et al.).
  *
  * Spark 4's `Column` wraps a `ColumnNode`, and the conversion helpers
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`
  * — this one-file subpackage re-exposes exactly the two conversions.
  * Building a Column directly from the expression keeps Column
  * construction a PURE operation: no function-registry mutation against
  * whatever session happens to be `SparkSession.active` at call time
  * (wrong session in multi-session/multi-threaded use), and no
  * name-based resolution later — the plan carries the expression
  * itself.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
