package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftExpr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Elementwise sum of `array<double>` as a native Catalyst aggregate.
 *
 * The K-dimensional vertex states (LDA topic counts, SGD latent vectors —
 * reference `src/LDA.cpp:129-192`, `src/SGD.cpp:60-118`) need an
 * elementwise-vector-sum ⊕. Built-ins can only express that as
 * posexplode → groupBy(key, k) → regroup(collect_list): TWO shuffles, each
 * carrying K× the rows. This aggregate does it in ONE shuffle at 1/K the
 * rows: partial buffers are primitive double arrays mutated in place
 * (map-side combine works as usual — partial per partition, merge at the
 * reducer), serialized between stages as raw little-endian doubles.
 *
 * Null inputs are ignored (like builtin `sum`); a group whose every input
 * is null yields null. All non-null inputs in a group must share one
 * length — mismatches throw rather than silently truncate.
 */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = null

  private def add(buf: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val b = if (buf == null) new Array[Double](n) else buf
    if (b.length != n)
      throw new IllegalArgumentException(
        s"vector_sum: mixed array lengths in one group (${b.length} vs $n)")
    var i = 0
    while (i < n) { b(i) += arr.getDouble(i); i += 1 }
    b
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b2 == null) b1
    else if (b1 == null) b2
    else {
      if (b1.length != b2.length)
        throw new IllegalArgumentException(
          s"vector_sum: mixed array lengths in one group (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = ByteBuffer.allocate(buf.length * 8)
      bb.asDoubleBuffer().put(buf)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val out = new Array[Double](bytes.length / 8)
      ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
      out
    }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VectorSum =
    copy(child = c)
}

object VectorSum {
  /** `vector_sum(col)`: elementwise sum of an `array<double>` column. */
  def vector_sum(c: Column): Column =
    GraftExpr.column(
      VectorSum(GraftExpr.expression(c)).toAggregateExpression())
}
