package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `sum_map(keys, values)` — ClickHouse `sumMap`: per group, sum `values`
  * keyed by the parallel `keys` array and return
  * struct(keys: sorted unique keys, values: their sums) — the
  * metrics-pipeline aggregate (ClickHouse "sumMap"; per-label counter
  * rollups). Spark-first shape: ONE TypedImperativeAggregate whose buffer
  * is the per-partition key→sum tree, merged pairwise — vs the naive
  * explode→groupBy(group, key)→re-collect plan, this removes the second
  * shuffle and the exploded row blow-up (same buffer-class family as
  * HyperLogLog++/percentile_approx in the Spark source, and as
  * [[VectorAvg]] here).
  *
  * Keys: string or long/int elements (sorted by natural order — the
  * ClickHouse contract); values coerce to double. Rows where the arrays
  * differ in length contribute min(len) pairs; null keys/values are
  * skipped (ClickHouse aggregates skip NULLs).
  */
case class SumMap(
    keys: Expression,
    values: Expression,
    op: Int = SumMap.OpSum, // OpSum | OpMin | OpMax (minMap/maxMap share the buffer)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[AnyRef, java.lang.Double]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  override def left: Expression = keys
  override def right: Expression = values
  override def prettyName: String = op match {
    case SumMap.OpMin => "min_map"
    case SumMap.OpMax => "max_map"
    case _            => "sum_map"
  }
  override def nullable: Boolean = true

  private lazy val keyType: DataType = keys.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType, ArrayType(DoubleType))

  override def checkInputDataTypes(): TypeCheckResult = keys.dataType match {
    case ArrayType(StringType | LongType | IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sum_map keys must be array<string|bigint|int>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("keys", ArrayType(keyType, containsNull = false)),
    StructField("values", ArrayType(DoubleType, containsNull = false))))

  override def createAggregationBuffer(): java.util.TreeMap[AnyRef, java.lang.Double] =
    new java.util.TreeMap[AnyRef, java.lang.Double]()

  private def keyAt(arr: ArrayData, i: Int): AnyRef = keyType match {
    case StringType  => arr.getUTF8String(i).toString
    case LongType    => java.lang.Long.valueOf(arr.getLong(i))
    case IntegerType => java.lang.Long.valueOf(arr.getInt(i).toLong)
    case _           => null
  }

  override def update(buf: java.util.TreeMap[AnyRef, java.lang.Double],
      input: InternalRow): java.util.TreeMap[AnyRef, java.lang.Double] = {
    val k = keys.eval(input)
    val v = values.eval(input)
    if (k != null && v != null) {
      val ka = k.asInstanceOf[ArrayData]
      val va = v.asInstanceOf[ArrayData]
      val n = math.min(ka.numElements(), va.numElements())
      var i = 0
      while (i < n) {
        if (!ka.isNullAt(i) && !va.isNullAt(i)) {
          val key = keyAt(ka, i)
          val add = va.getDouble(i)
          val prev = buf.get(key)
          buf.put(key, if (prev == null) add
            else java.lang.Double.valueOf(SumMap.comb(op, prev, add)))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeMap[AnyRef, java.lang.Double],
      b2: java.util.TreeMap[AnyRef, java.lang.Double]): java.util.TreeMap[AnyRef, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue
        else java.lang.Double.valueOf(SumMap.comb(op, prev, e.getValue)))
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[AnyRef, java.lang.Double]): Any = {
    if (buf.isEmpty) return null
    val n = buf.size()
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      ks(i) = keyType match {
        case StringType => UTF8String.fromString(e.getKey.asInstanceOf[String])
        case _          => e.getKey.asInstanceOf[java.lang.Long].longValue()
      }
      vs(i) = e.getValue.doubleValue()
      i += 1
    }
    InternalRow(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: java.util.TreeMap[AnyRef, java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keyType match {
        case StringType => out.writeUTF(e.getKey.asInstanceOf[String])
        case _          => out.writeLong(e.getKey.asInstanceOf[java.lang.Long].longValue())
      }
      out.writeDouble(e.getValue.doubleValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[AnyRef, java.lang.Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key: AnyRef = keyType match {
        case StringType => in.readUTF()
        case _          => java.lang.Long.valueOf(in.readLong())
      }
      buf.put(key, in.readDouble())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SumMap = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SumMap = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SumMap =
    copy(keys = l, values = r)
}

object SumMap {
  val OpSum = 0
  val OpMin = 1
  val OpMax = 2

  /** The per-key combine — associative and commutative for all three
    * ops, which is what makes the partial buffers mergeable in any
    * split/order (the property RollupPropertySpec-style gates rely on).
    */
  def comb(op: Int, a: Double, b: Double): Double = op match {
    case OpMin => math.min(a, b)
    case OpMax => math.max(a, b)
    case _     => a + b
  }
}
