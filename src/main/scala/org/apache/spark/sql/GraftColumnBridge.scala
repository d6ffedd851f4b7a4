package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression conversions that
  * Spark 4 removed from the public API. Lives in the
  * `org.apache.spark.sql` package solely to open that access for
  * graft's custom-expression Column wrappers; no Spark internals are
  * modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
