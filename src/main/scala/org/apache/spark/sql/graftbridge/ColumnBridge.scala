package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]`, so the graft engine's custom expressions
  * (e.g. [[graft.metrics.TolerantEqualsExpr]]) go through this shim —
  * the same pattern third-party Spark extensions (Delta, Sedona, etc.)
  * use for typed column construction.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
