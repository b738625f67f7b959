package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The `topKState` storage/merge pair for AggregatingMergeTree matviews
  * (ChDdl, SURVEY §16.3): [[CountPairs]] builds the per-insert-block
  * state — the EXACT value→count table, emitted as
  * `array<struct<v, c>>` sorted by value ascending (a canonical,
  * deterministic, oracle-able encoding; CH's topK state is a bounded
  * space-saving sketch — the same exactness-for-size trade the dialect's
  * exact `topK` aggregate documents) — and [[MergeCountPairs]] is the
  * read-time -Merge rule: sum counts per value across stored states.
  * Merging is associative and idempotent on merged output, so OPTIMIZE
  * can materialize it and later blocks keep merging. State size is
  * O(distinct values per key) — the honest cost of exactness, same
  * argument as uniqExactState (CH's uniqExact state IS the value set).
  */
private[graft] trait CountPairsLike
  extends TypedImperativeAggregate[java.util.HashMap[AnyRef, java.lang.Long]] {

  /** Whether the VALUE side of the pairs is a string (else long). */
  protected def keyIsString: Boolean

  final override def nullable: Boolean = false

  final override def dataType: DataType = CountPairs.pairsType(keyIsString)

  final override def createAggregationBuffer(): java.util.HashMap[AnyRef, java.lang.Long] =
    new java.util.HashMap[AnyRef, java.lang.Long]()

  final override def merge(b1: java.util.HashMap[AnyRef, java.lang.Long],
      b2: java.util.HashMap[AnyRef, java.lang.Long]): java.util.HashMap[AnyRef, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    b1
  }

  /** Canonical order: value ascending — states compare bit-identically. */
  final override def eval(buf: java.util.HashMap[AnyRef, java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    val ordered = buf.asScala.toSeq.sortWith {
      case ((a: String, _), (b: String, _)) => a < b
      case ((a: java.lang.Long, _), (b: java.lang.Long, _)) => a.longValue() < b.longValue()
      case _ => false
    }
    new GenericArrayData(ordered.map { case (key, c) =>
      val v: Any = key match {
        case s: String => UTF8String.fromString(s)
        case l: java.lang.Long => l.longValue()
      }
      InternalRow(v, c.longValue())
    }.toArray[Any])
  }

  final override def serialize(buf: java.util.HashMap[AnyRef, java.lang.Long]): Array[Byte] = {
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

  final override def deserialize(bytes: Array[Byte]): java.util.HashMap[AnyRef, java.lang.Long] = {
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
}

object CountPairs {
  def pairsType(keyIsString: Boolean): DataType = ArrayType(StructType(Seq(
    StructField("v", if (keyIsString) StringType else LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
}

/** Per-block state builder: exact value→count pairs of `child`'s values
  * (NULL keys skipped, like CH topK). String or integral values; ints
  * widen to long, the TopK convention.
  */
case class CountPairs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CountPairsLike with UnaryLike[Expression] {

  override def prettyName: String = "count_pairs"
  override protected def keyIsString: Boolean = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_pairs supports string|bigint|int values, got $t")
  }

  override def update(buf: java.util.HashMap[AnyRef, java.lang.Long],
      input: InternalRow): java.util.HashMap[AnyRef, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key: AnyRef = v match {
        case u: UTF8String => u.toString
        case l: java.lang.Long => l
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
        case other => other.toString
      }
      val prev = buf.get(key)
      buf.put(key, if (prev == null) java.lang.Long.valueOf(1L) else prev + 1L)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountPairs =
    copy(child = c)
}

/** Read-time -Merge: `child` is an `array<struct<v, c>>` states column;
  * counts sum per value across rows, output re-canonicalized (value asc).
  */
case class MergeCountPairs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CountPairsLike with UnaryLike[Expression] {

  override def prettyName: String = "merge_count_pairs"

  override protected def keyIsString: Boolean = child.dataType match {
    case ArrayType(s: StructType, _) => s.head.dataType == StringType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
      if s.length == 2 &&
        (s.head.dataType == StringType || s.head.dataType == LongType) &&
        s(1).dataType == LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"merge_count_pairs expects array<struct<v: string|bigint, c: bigint>>, got $t")
  }

  override def update(buf: java.util.HashMap[AnyRef, java.lang.Long],
      input: InternalRow): java.util.HashMap[AnyRef, java.lang.Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < a.numElements()) {
        val row = a.getStruct(i, 2)
        val key: AnyRef =
          if (keyIsString) row.getUTF8String(0).toString
          else java.lang.Long.valueOf(row.getLong(0))
        val c = row.getLong(1)
        val prev = buf.get(key)
        buf.put(key, if (prev == null) java.lang.Long.valueOf(c) else prev + c)
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MergeCountPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MergeCountPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MergeCountPairs =
    copy(child = c)
}
