package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.GraftExpr

/**
 * SQL registration for graft's native Catalyst functions, so `spark.sql`
 * users get them under the same names the Scala API uses. Two entry points:
 *
 *  - spark-submit / conf users: `--conf spark.sql.extensions=
 *    graft.functions.GraftExtensions` (the standard [[SparkSessionExtensions]]
 *    injection path — survives session cloning and works with no code change);
 *  - programmatic users with a session already running:
 *    `GraftFunctions.register(spark)`.
 */
object GraftFunctions {
  type Description = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val descriptions: Seq[Description] = Seq(
    (FunctionIdentifier("vector_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "vector_sum"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => VectorSum(c)
        case _ => throw new IllegalArgumentException(
          s"vector_sum takes exactly 1 argument, got ${children.length}")
      }),
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VectorDot(a, b)
        case _ => throw new IllegalArgumentException(
          s"vector_dot takes exactly 2 arguments, got ${children.length}")
      }),
    (FunctionIdentifier("vector_bitor"),
      new ExpressionInfo(classOf[VectorBitOr].getName, "vector_bitor"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => VectorBitOr(c)
        case _ => throw new IllegalArgumentException(
          s"vector_bitor takes exactly 1 argument, got ${children.length}")
      }),
    (FunctionIdentifier("vector_lsum"),
      new ExpressionInfo(classOf[VectorLSum].getName, "vector_lsum"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => VectorLSum(c)
        case _ => throw new IllegalArgumentException(
          s"vector_lsum takes exactly 1 argument, got ${children.length}")
      })) ++ VectorArith.ops.toSeq.sorted.map { op =>
    (FunctionIdentifier(s"vector_$op"),
      new ExpressionInfo(classOf[VectorArith].getName, s"vector_$op"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VectorArith(a, b, op)
        case _ => throw new IllegalArgumentException(
          s"vector_$op takes exactly 2 arguments, got ${children.length}")
      })
  }

  /** Register every graft function into a running session's registry. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, b) =>
      GraftExpr.registerFunction(spark, id, info, b)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptions.foreach(ext.injectFunction)
}
