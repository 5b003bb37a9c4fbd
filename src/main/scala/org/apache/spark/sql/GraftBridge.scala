package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: wraps a raw Catalyst Expression
  * into a public Column (and back) for graft's custom expressions.
  * Lives in the o.a.s.sql package solely to satisfy the access scope —
  * no Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
