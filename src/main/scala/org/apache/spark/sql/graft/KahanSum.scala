package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** ClickHouse `sumKahan`: compensated (Kahan–Babuška) double summation.
  * Buffer = (sum, compensation) — O(1), map-side combined; merge adds the
  * partner's sum AND compensation through the same compensated step, so
  * precision is preserved across partial aggregation. Not bit-identical
  * to CH (both are partition-order-dependent at the last bit, like every
  * distributed float sum) — gated by spec against exact decimal sums,
  * where naive summation demonstrably drifts and Kahan holds.
  */
case class KahanSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  override def prettyName: String = "sum_kahan"
  override def nullable: Boolean = false
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Double] = Array(0.0, 0.0)

  private def kadd(buf: Array[Double], x: Double): Unit = {
    val y = x - buf(1)
    val t = buf(0) + y
    buf(1) = (t - buf(0)) - y
    buf(0) = t
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) kadd(buf, Num.toD(v))
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    kadd(b1, b2(0))
    kadd(b1, -b2(1))
    b1
  }

  override def eval(buf: Array[Double]): Any = buf(0) - buf(1)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(buf(0)); out.writeDouble(buf(1))
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array(in.readDouble(), in.readDouble())
  }

  override def withNewMutableAggBufferOffset(n: Int): KahanSumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KahanSumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KahanSumAgg =
    copy(child = c)
}
