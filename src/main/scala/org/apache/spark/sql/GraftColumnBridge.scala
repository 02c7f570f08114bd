package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions, so
  * graft's native Catalyst expressions (e.g. `graft.functions.DotProduct`)
  * can surface as ordinary `Column`s. Lives in `org.apache.spark.sql` by
  * necessity — the standard pattern for Spark-native extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
