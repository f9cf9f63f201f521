package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions so
  * graft can expose custom Catalyst expressions as user-facing Columns
  * (Spark 4 removed the public `new Column(expr)` constructor).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Deterministic structural rendering of an (unresolved) Column —
    * the node tree with `Origin`s stripped (`normalized`), so two
    * Columns built by the same code render identically. Raw
    * `Expression.toString` is NOT usable as a cache key: every node
    * carries an `Origin(... StackTraceElement@identityHash ...)`.
    */
  def structuralKey(c: Column): String = c.node.normalized.toString
}
