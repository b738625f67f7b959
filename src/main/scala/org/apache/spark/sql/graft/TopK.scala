package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `top_k(x[, w], k)` — ClickHouse `topK(k)(x)` / `topKWeighted(k)(x, w)`:
  * the k most frequent values
  * as an array, most frequent first. ClickHouse computes this
  * APPROXIMATELY (filtered space-saving); this implementation is EXACT —
  * buffer = value→count map per group per partition, merged by summing —
  * and deterministic: ties broken by value ascending (ClickHouse's tie
  * order is unspecified), which is what lets q163 gate it against a SQL
  * oracle. The documented trade: buffer memory is O(distinct values per
  * group); for unbounded-cardinality columns at 100 TB prefer the
  * two-shuffle exact SQL (groupBy count → rank) or cap the domain first
  * — the dialect keeps the exact form because the reference's group-by
  * domains (event types, labels, languages) are small.
  *
  * Keys: string or long/int (int widens to long in the output, as
  * sum_map does).
  */
case class TopK(
    child: Expression,
    weight: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[AnyRef, java.lang.Long]]
  with TernaryLike[Expression] {

  override def first: Expression = child
  override def second: Expression = weight
  override def third: Expression = kExpr
  override def prettyName: String =
    if (weighted) "top_k_weighted" else "top_k"
  private lazy val weighted: Boolean = weight match {
    case Literal(w: java.lang.Long, LongType) => w.longValue() != 1L
    case _ => true
  }
  override def nullable: Boolean = false

  private lazy val k: Int = {
    require(kExpr.foldable, s"topK k must be a literal, got $kExpr")
    Num.toI(kExpr.eval(null))
  }

  private lazy val keyIsString = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType =>
      if (!kExpr.dataType.isInstanceOf[IntegralType])
        TypeCheckResult.TypeCheckFailure(
          s"top_k k must be integral, got ${kExpr.dataType}")
      else if (!weight.dataType.isInstanceOf[IntegralType])
        TypeCheckResult.TypeCheckFailure(
          s"top_k weight must be integral, got ${weight.dataType}")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_k supports string|bigint|int values, got $t")
  }

  override def dataType: DataType = ArrayType(
    if (keyIsString) StringType else LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[AnyRef, java.lang.Long] =
    new java.util.HashMap[AnyRef, java.lang.Long]()

  override def update(buf: java.util.HashMap[AnyRef, java.lang.Long],
      input: InternalRow): java.util.HashMap[AnyRef, java.lang.Long] = {
    val v = child.eval(input)
    val w = weight.eval(input)
    // ClickHouse topKWeighted skips NULL keys; a NULL weight counts as 0
    if (v != null && w != null) {
      val key: AnyRef = v match {
        case u: UTF8String => u.toString
        case l: java.lang.Long => l
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
        case other => other.toString
      }
      val inc = Num.toL(w)
      val prev = buf.get(key)
      buf.put(key, if (prev == null) inc else prev + inc)
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
    // count desc, then value asc (strings lexicographic, longs numeric)
    val ordered = buf.asScala.toSeq.sortWith { case ((k1, c1), (k2, c2)) =>
      if (c1.longValue() != c2.longValue()) c1.longValue() > c2.longValue()
      else (k1, k2) match {
        case (a: String, b: String) => a < b
        case (a: java.lang.Long, b: java.lang.Long) => a.longValue() < b.longValue()
        case _ => false
      }
    }.take(k)
    new GenericArrayData(ordered.map { case (key, _) =>
      key match {
        case s: String => UTF8String.fromString(s): Any
        case l: java.lang.Long => l.longValue(): Any
      }
    }.toArray)
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

  override def withNewMutableAggBufferOffset(o: Int): TopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): TopK =
    copy(child = f, weight = s, kExpr = t)
}

object TopK {
  /** Unweighted form (ClickHouse `topK(k)(x)`): weight 1 per row. */
  def apply(child: Expression, kExpr: Expression): TopK =
    TopK(child, Literal(1L), kExpr)
}

/** `uniq_up_to(x, n)` — ClickHouse `uniqUpTo(N)(x)`: exact distinct count
  * saturated at N+1 ("N or more"). The buffer is a set CAPPED at N+1
  * elements — once saturated, updates and merges are free and the state
  * stays O(N) per group regardless of true cardinality, which is the
  * whole point of the function at 100 TB (vs uniqExact's unbounded
  * state). Exact, hence oracle-expressible as
  * `least(count(DISTINCT x), N+1)`.
  */
case class UniqUpTo(
    child: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[AnyRef]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = nExpr
  override def prettyName: String = "uniq_up_to"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  private lazy val n: Int = {
    require(nExpr.foldable, s"uniqUpTo n must be a literal, got $nExpr")
    Num.toI(nExpr.eval(null))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType =>
      if (nExpr.dataType.isInstanceOf[IntegralType])
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"uniq_up_to n must be integral, got ${nExpr.dataType}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"uniq_up_to supports string|bigint|int values, got $t")
  }

  override def createAggregationBuffer(): java.util.HashSet[AnyRef] =
    new java.util.HashSet[AnyRef]()

  override def update(buf: java.util.HashSet[AnyRef],
      input: InternalRow): java.util.HashSet[AnyRef] = {
    if (buf.size() <= n) { // saturated at n+1: stop accumulating
      val v = child.eval(input)
      if (v != null) buf.add(v match {
        case u: UTF8String => u.toString
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
        case other => other.asInstanceOf[AnyRef]
      })
    }
    buf
  }

  override def merge(b1: java.util.HashSet[AnyRef],
      b2: java.util.HashSet[AnyRef]): java.util.HashSet[AnyRef] = {
    val it = b2.iterator()
    while (it.hasNext && b1.size() <= n) b1.add(it.next())
    b1
  }

  override def eval(buf: java.util.HashSet[AnyRef]): Any =
    math.min(buf.size().toLong, n + 1L)

  override def serialize(buf: java.util.HashSet[AnyRef]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val isString = child.dataType == StringType
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val v = it.next()
      if (isString) out.writeUTF(v.asInstanceOf[String])
      else out.writeLong(v.asInstanceOf[java.lang.Long].longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[AnyRef] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val isString = child.dataType == StringType
    val m = in.readInt()
    var i = 0
    while (i < m) {
      buf.add(if (isString) in.readUTF()
        else java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): UniqUpTo =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UniqUpTo =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): UniqUpTo = copy(child = l, nExpr = r)
}
