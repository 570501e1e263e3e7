package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters.
  *
  * Spark 4's public `Column` is Connect-compatible and no longer exposes
  * `.expr` / `new Column(Expression)`; the supported classic-mode path is
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is package-private.
  * This shim (compiled into the sql package, the standard extension trick)
  * is the single place the library crosses that boundary to register custom
  * Catalyst expressions as Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
