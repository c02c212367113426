package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column⇄Expression bridging behind `private[sql]`
  * (`classic.ExpressionUtils`, the Connect refactor). This shim re-exports
  * exactly the conversions graft's native Catalyst expressions need —
  * nothing else from the private surface. */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function into a RUNNING session's registry
    * (`sessionState` returns the `private[sql]` SessionState, so the call
    * has to live on this side of the package boundary). */
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
