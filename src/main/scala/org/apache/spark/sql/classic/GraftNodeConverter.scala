package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Unwrap a Column to its FULLY-CONVERTED Catalyst tree.
  * `ExpressionUtils.expression` returns a lazy `ColumnNodeExpression`
  * (children empty — a leaf to `collect`/`transform`); this forces the
  * node conversion so tree inspection sees the real operators. Lives
  * in the `classic` package because `ColumnNodeExpression` is
  * `private[classic]`. */
private[sql] object GraftNodeConverter {
  def toCatalyst(c: Column): Expression =
    ExpressionUtils.expression(c) match {
      case ColumnNodeExpression(node) => ColumnNodeToExpressionConverter(node)
      case e => e
    }
}
