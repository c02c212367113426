package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftExpr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Elementwise bitwise OR of `array<long>` as a native Catalyst aggregate —
 * the ⊕ of the Flajolet–Martin / HyperBall neighborhood-function semiring
 * (each long is a 64-slot bit-register block; OR is idempotent, commutative
 * and associative, so map-side partial aggregation is exact and a task retry
 * can never corrupt a group). Built-ins could only express this as
 * posexplode → groupBy(key, k) → bit_or → regroup: TWO shuffles carrying K×
 * the rows; this does it in ONE shuffle at 1/K the rows, like [[VectorSum]].
 *
 * Null inputs are ignored; a group whose every input is null yields null.
 * All non-null inputs in a group must share one length — mismatches throw
 * rather than silently truncate.
 */
case class VectorBitOr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = null

  private def add(buf: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val b = if (buf == null) new Array[Long](n) else buf
    if (b.length != n)
      throw new IllegalArgumentException(
        s"vector_bitor: mixed array lengths in one group (${b.length} vs $n)")
    var i = 0
    while (i < n) { b(i) |= arr.getLong(i); i += 1 }
    b
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b2 == null) b1
    else if (b1 == null) b2
    else {
      if (b1.length != b2.length)
        throw new IllegalArgumentException(
          s"vector_bitor: mixed array lengths in one group (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = ByteBuffer.allocate(buf.length * 8)
      bb.asLongBuffer().put(buf)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    if (bytes.isEmpty) null
    else {
      val out = new Array[Long](bytes.length / 8)
      ByteBuffer.wrap(bytes).asLongBuffer().get(out)
      out
    }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vector_bitor"

  override def withNewMutableAggBufferOffset(offset: Int): VectorBitOr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorBitOr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VectorBitOr =
    copy(child = c)
}

object VectorBitOr {
  /** `vector_bitor(col)`: elementwise bitwise OR of an `array<long>` column. */
  def vector_bitor(c: Column): Column =
    GraftExpr.column(
      VectorBitOr(GraftExpr.expression(c)).toAggregateExpression())
}
