package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * Spark 4 removed the public `Column(expr)` constructor (Connect
  * split), so custom Catalyst expressions need this one package-scoped
  * hop to surface as `Column`s. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
