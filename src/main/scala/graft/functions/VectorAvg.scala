package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native elementwise-average aggregate over ArrayType(FloatType)
  * embedding columns — the shuffle-frugal centroid build.
  *
  * The composable rendering (posexplode → groupBy(label, pos)) inflates
  * every row 64× before the shuffle; this TypedImperativeAggregate keeps
  * one (sums[dim], count) buffer per group, updates in place map-side,
  * and ships exactly one buffer per (partition, group) through the
  * exchange — the classic IVF coarse-quantizer training shape at scale.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvg.Buffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  // reject non-float arrays at analysis time — getFloat on a double
  // array would silently read half-words
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VectorAvg.Buffer =
    new VectorAvg.Buffer(null, 0L)

  override def update(b: VectorAvg.Buffer, input: InternalRow): VectorAvg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](n)
      require(n == b.sums.length,
        s"vector_avg: ragged input — expected ${b.sums.length} dims, got $n")
      var i = 0
      while (i < n) { b.sums(i) += arr.getFloat(i).toDouble; i += 1 }
      b.count += 1
    }
    b
  }

  override def merge(b: VectorAvg.Buffer, o: VectorAvg.Buffer): VectorAvg.Buffer = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums.clone(); b.count = o.count }
      else {
        require(b.sums.length == o.sums.length,
          s"vector_avg: ragged merge — ${b.sums.length} vs ${o.sums.length} dims")
        var i = 0
        while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
        b.count += o.count
      }
    }
    b
  }

  override def eval(b: VectorAvg.Buffer): Any =
    if (b.sums == null || b.count == 0L) null
    else new GenericArrayData(b.sums.map(_ / b.count))

  override def serialize(b: VectorAvg.Buffer): Array[Byte] = {
    val n = if (b.sums == null) 0 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 * n)
    buf.putLong(b.count).putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val count = buf.getLong
    val n = buf.getInt
    if (n == 0) new VectorAvg.Buffer(null, count)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = buf.getDouble; i += 1 }
      new VectorAvg.Buffer(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorAvg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorAvg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAvg {
  final class Buffer(var sums: Array[Double], var count: Long)
}
