package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column⇄Expression bridging behind `private[sql]`
  * (`classic.ExpressionUtils`, the Connect refactor). This shim re-exports
  * exactly the two conversions graft's native Catalyst expressions need —
  * nothing else from the private surface. */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
