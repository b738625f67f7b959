package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The ClickHouse `-ForEach` aggregate combinator over array columns:
  * `sumForEach` / `minForEach` / `maxForEach` / `avgForEach` /
  * `countForEach` aggregate POSITION-WISE across rows, returning one
  * array whose length is the max observed input length (positions an
  * input array doesn't reach contribute nothing — ClickHouse's ragged
  * rule). Buffer = one pair of position-indexed (value, count) arrays,
  * grown on demand; merge is element-wise and ASSOCIATIVE+COMMUTATIVE
  * for min/max/count. For sum/avg the double addition order follows the
  * merge order like every distributed double sum (Spark's own
  * `sum(double)` included) — gate through rounding, as q71/vector_avg
  * does.
  */
case class ForEachAgg(
    child: Expression,
    op: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ForEachAgg.Buf]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  override def prettyName: String = s"${op}ForEach"
  override def nullable: Boolean = false
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  // min/max/avg of an EMPTY position (reachable when some input array has
  // null elements at an index, which extends len without contributing) is
  // null, not a spurious 0.0 — CH's Nullable-min-of-nothing rule. sum and
  // count of nothing stay 0 / 0L.
  override def dataType: DataType = op match {
    case "count" => ArrayType(LongType, containsNull = false)
    case "sum" => ArrayType(DoubleType, containsNull = false)
    case _ => ArrayType(DoubleType, containsNull = true)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Set("sum", "min", "max", "avg", "count").contains(op))
      TypeCheckResult.TypeCheckFailure(
        s"ForEachAgg op must be sum|min|max|avg|count, got '$op'")
    else if (!child.dataType.isInstanceOf[ArrayType])
      TypeCheckResult.TypeCheckFailure(
        s"${prettyName} needs an array column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ForEachAgg.Buf = new ForEachAgg.Buf()

  override def update(buf: ForEachAgg.Buf, input: InternalRow): ForEachAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.ensure(n, op)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = arr.getDouble(i)
          op match {
            case "sum" | "avg" => buf.vals(i) += x
            case "min" => if (buf.cnts(i) == 0L || x < buf.vals(i)) buf.vals(i) = x
            case "max" => if (buf.cnts(i) == 0L || x > buf.vals(i)) buf.vals(i) = x
            case "count" => // count only
          }
          buf.cnts(i) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: ForEachAgg.Buf, b2: ForEachAgg.Buf): ForEachAgg.Buf = {
    b1.ensure(b2.len, op)
    var i = 0
    while (i < b2.len) {
      if (b2.cnts(i) > 0L) {
        op match {
          case "sum" | "avg" => b1.vals(i) += b2.vals(i)
          case "min" => if (b1.cnts(i) == 0L || b2.vals(i) < b1.vals(i)) b1.vals(i) = b2.vals(i)
          case "max" => if (b1.cnts(i) == 0L || b2.vals(i) > b1.vals(i)) b1.vals(i) = b2.vals(i)
          case "count" =>
        }
        b1.cnts(i) += b2.cnts(i)
      }
      i += 1
    }
    b1
  }

  override def eval(buf: ForEachAgg.Buf): Any = op match {
    case "count" => new GenericArrayData(buf.cnts.take(buf.len))
    case "sum" => new GenericArrayData(buf.vals.take(buf.len))
    case "avg" =>
      val out = new Array[Any](buf.len)
      var i = 0
      while (i < buf.len) {
        out(i) = if (buf.cnts(i) == 0L) null else buf.vals(i) / buf.cnts(i)
        i += 1
      }
      new GenericArrayData(out)
    case _ => // min | max: empty position -> null, never a fabricated 0.0
      val out = new Array[Any](buf.len)
      var i = 0
      while (i < buf.len) {
        out(i) = if (buf.cnts(i) == 0L) null else buf.vals(i)
        i += 1
      }
      new GenericArrayData(out)
  }

  override def serialize(buf: ForEachAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.len)
    var i = 0
    while (i < buf.len) { out.writeDouble(buf.vals(i)); out.writeLong(buf.cnts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ForEachAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    buf.ensure(n, op)
    var i = 0
    while (i < n) { buf.vals(i) = in.readDouble(); buf.cnts(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ForEachAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ForEachAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ForEachAgg =
    copy(child = c)
}

object ForEachAgg {
  /** Growable position-indexed accumulator. `vals` carries sums or the
    * current min/max; `cnts` carries per-position presence counts (also
    * the min/max "seen" flag and the avg denominator).
    */
  final class Buf {
    var vals: Array[Double] = Array.emptyDoubleArray
    var cnts: Array[Long] = Array.emptyLongArray
    var len: Int = 0

    def ensure(n: Int, op: String): Unit = {
      if (n > vals.length) {
        val nv = java.util.Arrays.copyOf(vals, math.max(n, vals.length * 2))
        val nc = java.util.Arrays.copyOf(cnts, nv.length)
        vals = nv; cnts = nc
      }
      if (n > len) len = n
    }
  }
}
