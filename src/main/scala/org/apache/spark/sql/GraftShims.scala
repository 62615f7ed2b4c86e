package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4's Column API no longer exposes
  * the Catalyst expression (Connect decoupling); the classic bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is private[sql],
  * so this one-file shim inside the sql package re-exports the two
  * conversions custom Expressions need. No Spark internals are
  * modified or shadowed.
  */
object GraftShims {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
