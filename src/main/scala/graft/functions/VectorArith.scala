package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftExpr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Elementwise `array<double>` arithmetic as native codegen'd expressions —
 * the per-edge hot-path algebra of the K-dimensional vertex programs (LDA
 * topic updates, SGD latent-factor updates; reference `src/LDA.cpp:129-192`,
 * `src/SGD.cpp:60-118`).
 *
 * These replace `zip_with`/`transform` lambdas, which are `CodegenFallback`:
 * every routed edge paid interpreted `Expression.eval` per element per
 * lambda. Each op here is one codegen'd loop per row.
 *
 * Semantics mirror the higher-order forms they replace, bit for bit:
 *  - `op` applies left-to-right per element (IEEE order preserved);
 *  - array ⊕ array: result length = max(n₁,n₂); positions past the shorter
 *    side (zip_with's null padding) and positions where either element is
 *    null are null;
 *  - array ⊕ scalar: per-element `x op s`;
 *  - a null ARRAY (either side) nulls the whole result. Deviation from
 *    `transform`: a null SCALAR also nulls the whole result (transform would
 *    produce an array of null elements) — unreachable in the algorithms,
 *    where scalars are non-null expressions.
 */
case class VectorArith(left: Expression, right: Expression, op: String)
  extends BinaryExpression {

  require(VectorArith.ops.contains(op), s"vector arith op must be one of ${VectorArith.ops}, got $op")

  private def isArr(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val scalarRight = right.dataType == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isArr(left.dataType) && (isArr(right.dataType) || right.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_$op needs (array<double>, array<double>|double), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = s"vector_$op"

  @inline private def apply2(x: Double, y: Double): Double = op match {
    case "add" => x + y
    case "sub" => x - y
    case "mul" => x * y
    case "div" => x / y
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (scalarRight) {
      val s = b.asInstanceOf[Double]
      val n = x.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (x.isNullAt(i)) null else apply2(x.getDouble(i), s)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val y = b.asInstanceOf[ArrayData]
      val n1 = x.numElements(); val n2 = y.numElements()
      val n = math.max(n1, n2)
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (i >= n1 || i >= n2 || x.isNullAt(i) || y.isNullAt(i)) null
          else apply2(x.getDouble(i), y.getDouble(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val opSym = op match {
      case "add" => "+"; case "sub" => "-"; case "mul" => "*"; case "div" => "/"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      if (scalarRight) {
        s"""
           |final int $n = $a.numElements();
           |org.apache.spark.sql.catalyst.util.ArrayData $out =
           |  org.apache.spark.sql.catalyst.util.ArrayData.allocateArrayData(8, $n, "$prettyName");
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) $out.setNullAt($i);
           |  else $out.setDouble($i, $a.getDouble($i) $opSym $b);
           |}
           |${ev.value} = $out;
         """.stripMargin
      } else {
        val n1 = ctx.freshName("n1")
        val n2 = ctx.freshName("n2")
        s"""
           |final int $n1 = $a.numElements();
           |final int $n2 = $b.numElements();
           |final int $n = java.lang.Math.max($n1, $n2);
           |org.apache.spark.sql.catalyst.util.ArrayData $out =
           |  org.apache.spark.sql.catalyst.util.ArrayData.allocateArrayData(8, $n, "$prettyName");
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($i >= $n1 || $i >= $n2 || $a.isNullAt($i) || $b.isNullAt($i)) $out.setNullAt($i);
           |  else $out.setDouble($i, $a.getDouble($i) $opSym $b.getDouble($i));
           |}
           |${ev.value} = $out;
         """.stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorArith =
    copy(left = l, right = r)
}

object VectorArith {
  val ops = Set("add", "sub", "mul", "div")

  private def mk(op: String)(a: Column, b: Column): Column =
    GraftExpr.column(VectorArith(GraftExpr.expression(a), GraftExpr.expression(b), op))

  /** Elementwise x+y / x−y / x·y / x÷y; right side array or double scalar. */
  def vector_add(a: Column, b: Column): Column = mk("add")(a, b)
  def vector_sub(a: Column, b: Column): Column = mk("sub")(a, b)
  def vector_mul(a: Column, b: Column): Column = mk("mul")(a, b)
  def vector_div(a: Column, b: Column): Column = mk("div")(a, b)
}

/**
 * Strict left-fold sum of an `array<double>` — native twin of
 * `aggregate(v, 0.0, (acc, x) => acc + x)`: empty array → 0.0, null array or
 * any null element → null, additions strictly in index order.
 */
case class VectorLSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_lsum needs array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_lsum"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      acc = acc + x.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc = $acc + $a.getDouble($i);
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VectorLSum = copy(child = c)
}

object VectorLSum {
  def vector_lsum(a: Column): Column =
    GraftExpr.column(VectorLSum(GraftExpr.expression(a)))
}
