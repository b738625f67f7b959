package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vector_avg(vec)` — element-wise mean of float vectors; the custom
  * UDAF surface of SURVEY.md §2.10 (centroid-sum aggregate), used by the
  * IVF index build (k-means re-estimation) instead of a
  * posexplode-to-(cluster,dim) shuffle: the buffer is one double[dim] per
  * group per partition, merged pairwise — shuffle volume drops from
  * rows×dim exploded rows to groups×dim.
  *
  * TypedImperativeAggregate with a mutable (double[], count) buffer —
  * the Spark-idiomatic shape for sketch-like aggregation state (same
  * class as HyperLogLog++ / percentile_approx in the Spark source).
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvg.Buffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_avg"

  override def createAggregationBuffer(): VectorAvg.Buffer = new VectorAvg.Buffer(null, 0L)

  override def update(buf: VectorAvg.Buffer, input: InternalRow): VectorAvg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      val m = math.min(n, buf.sums.length)
      var i = 0
      while (i < m) { buf.sums(i) += arr.getFloat(i); i += 1 }
      buf.count += 1
    }
    buf
  }

  override def merge(b1: VectorAvg.Buffer, b2: VectorAvg.Buffer): VectorAvg.Buffer = {
    if (b2.sums != null) {
      if (b1.sums == null) { b1.sums = b2.sums; b1.count = b2.count }
      else {
        val m = math.min(b1.sums.length, b2.sums.length)
        var i = 0
        while (i < m) { b1.sums(i) += b2.sums(i); i += 1 }
        b1.count += b2.count
      }
    }
    b1
  }

  override def eval(buf: VectorAvg.Buffer): Any =
    if (buf.sums == null || buf.count == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VectorAvg.Buffer): Array[Byte] = {
    if (buf.sums == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(8 + 4 + 8 * buf.sums.length)
    bb.putLong(buf.count).putInt(buf.sums.length)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buffer = {
    if (bytes.isEmpty) return new VectorAvg.Buffer(null, 0L)
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    val sums = Array.fill(n)(bb.getDouble)
    new VectorAvg.Buffer(sums, count)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorAvg = copy(child = c)
}

object VectorAvg {
  final class Buffer(var sums: Array[Double], var count: Long)
}
