package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `entropy(x)` — Shannon entropy (bits) of the value distribution,
  * ClickHouse's aggregate of the same name. Buffer = value→count map per
  * group per partition, merged by summing (exact); eval sums
  * −(c/N)·log2(c/N) in SORTED key order, so the double summation order —
  * and hence the result to the last bit — is independent of partitioning.
  * State is O(distinct values per group), the same documented trade as
  * the exact topK (the dialect's target columns are labels/types, not
  * open domains).
  */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[AnyRef, java.lang.Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "entropy"
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  private lazy val keyIsString = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"entropy supports string|bigint|int values, got $t")
  }

  override def createAggregationBuffer(): java.util.HashMap[AnyRef, java.lang.Long] =
    new java.util.HashMap[AnyRef, java.lang.Long]()

  override def update(buf: java.util.HashMap[AnyRef, java.lang.Long],
      input: InternalRow): java.util.HashMap[AnyRef, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key: AnyRef = v match {
        case u: UTF8String => u.toString
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
        case other => other.asInstanceOf[AnyRef]
      }
      val prev = buf.get(key)
      buf.put(key, if (prev == null) 1L else prev + 1L)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[AnyRef, java.lang.Long],
      b2: java.util.HashMap[AnyRef, java.lang.Long]): java.util.HashMap[AnyRef, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[AnyRef, java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    if (buf.isEmpty) return 0.0
    var n = 0.0
    buf.values().asScala.foreach(c => n += c.doubleValue())
    val counts = buf.asScala.toSeq.sortWith { case ((k1, _), (k2, _)) =>
      (k1, k2) match {
        case (a: String, b: String) => a < b
        case (a: java.lang.Long, b: java.lang.Long) => a.longValue() < b.longValue()
        case _ => false
      }
    }
    var h = 0.0
    counts.foreach { case (_, c) =>
      val p = c.doubleValue() / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  override def serialize(buf: java.util.HashMap[AnyRef, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (keyIsString) out.writeUTF(e.getKey.asInstanceOf[String])
      else out.writeLong(e.getKey.asInstanceOf[java.lang.Long].longValue())
      out.writeLong(e.getValue.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[AnyRef, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key: AnyRef =
        if (keyIsString) in.readUTF() else java.lang.Long.valueOf(in.readLong())
      buf.put(key, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): EntropyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EntropyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): EntropyAgg =
    copy(child = c)
}
