package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ordered-collection aggregates (the CH `groupArraySorted` /
  * `groupArrayLast` / `groupArrayInsertAt` family) with BOUNDED O(n)
  * buffers — a size-n heap per group, never the group's row count, so
  * the family holds at any group cardinality:
  *
  *   - `groupArraySorted(x, n)`: the n SMALLEST values of x, ascending
  *     (CH's own semantics — no order contract needed, x is the order).
  *   - `groupArrayLast(sortKey, x, n)`: the values at the n LARGEST
  *     sort keys, emitted in ascending key order — CH's "last n in
  *     insertion order" under graft's explicit-sort-key contract (the
  *     MovingAgg/funnel rule: CH trusts block order, a distributed
  *     engine must not). Ties order by value, so results are total.
  *   - `groupArrayInsertAt(x, pos, default, size)`: x placed at
  *     position pos, `default` elsewhere, length `size` (-1 = max
  *     pos+1). Position collisions take the SMALLEST value (CH leaves
  *     collision choice unspecified; graft pins it).
  *
  * Value types: integral (emitted BIGINT), floating (DOUBLE), or
  * STRING — the TopK codec rule.
  */
private[graft] object VCodec {
  final val KLong = 0; final val KDouble = 1; final val KString = 2

  def kindOf(dt: DataType, what: String): Int = dt match {
    case LongType | IntegerType | ShortType | ByteType => KLong
    case DoubleType | FloatType | _: DecimalType => KDouble
    case StringType => KString
    case t => throw new IllegalArgumentException(
      s"$what supports integral/floating/string values, got ${t.sql}")
  }

  def elemType(kind: Int): DataType = kind match {
    case KLong => LongType
    case KDouble => DoubleType
    case _ => StringType
  }

  /** Normalize an eval() result to the codec's storage form. */
  def norm(kind: Int, v: Any): Any = kind match {
    case KLong => Num.toL(v)
    case KDouble => Num.toD(v)
    case _ => v.asInstanceOf[UTF8String].toString
  }

  def out(kind: Int, v: Any): Any = kind match {
    case KString => UTF8String.fromString(v.asInstanceOf[String])
    case _ => v
  }

  def lt(kind: Int, a: Any, b: Any): Boolean = kind match {
    case KLong => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case KDouble => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case _ => a.asInstanceOf[String] < b.asInstanceOf[String]
  }

  def write(out: DataOutputStream, kind: Int, v: Any): Unit = kind match {
    case KLong => out.writeLong(v.asInstanceOf[Long])
    case KDouble => out.writeDouble(v.asInstanceOf[Double])
    case _ => out.writeUTF(v.asInstanceOf[String])
  }

  def read(in: DataInputStream, kind: Int): Any = kind match {
    case KLong => in.readLong()
    case KDouble => in.readDouble()
    case _ => in.readUTF()
  }

  def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal, got $e")
    Num.toI(e.eval(null))
  }
}

/** Shared heap buffer: (key, value) pairs, bounded at n, keeping either
  * the smallest (keepSmallest) or largest pairs under (key, value)
  * lexicographic order.
  */
private[graft] final class BoundedPairs(val n: Int, val keepSmallest: Boolean,
    val kind: Int) {
  // heap root = the pair to EVICT next (max-heap when keeping smallest)
  private def cmp(a: (Long, Any), b: (Long, Any)): Int = {
    val k = java.lang.Long.compare(a._1, b._1)
    val c = if (k != 0) k else {
      if (VCodec.lt(kind, a._2, b._2)) -1
      else if (VCodec.lt(kind, b._2, a._2)) 1 else 0
    }
    if (keepSmallest) -c else c // evict max when keeping smallest
  }
  val heap = new java.util.PriorityQueue[(Long, Any)](
    math.max(1, n), (a, b) => cmp(a, b))

  def add(key: Long, v: Any): Unit = {
    if (heap.size < n) heap.add((key, v))
    else if (n > 0 && cmp((key, v), heap.peek()) > 0) {
      heap.poll(); heap.add((key, v))
    }
  }

  /** Ascending (key, value) order. */
  def sorted: Array[(Long, Any)] = {
    val arr = heap.toArray(new Array[(Long, Any)](heap.size))
    scala.util.Sorting.stableSort(arr, (a: (Long, Any), b: (Long, Any)) => {
      val k = java.lang.Long.compare(a._1, b._1)
      (if (k != 0) k else {
        if (VCodec.lt(kind, a._2, b._2)) -1
        else if (VCodec.lt(kind, b._2, a._2)) 1 else 0
      }) < 0
    })
    arr
  }
}

abstract class BoundedCollectAgg extends TypedImperativeAggregate[BoundedPairs] {
  protected def valueExpr: Expression
  protected def nExpr: Expression
  protected def keepSmallest: Boolean

  protected lazy val kind: Int = VCodec.kindOf(valueExpr.dataType, prettyName)
  protected lazy val n: Int = {
    val v = VCodec.litInt(nExpr, s"$prettyName n")
    require(v > 0, s"$prettyName n must be > 0, got $v")
    v
  }

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(VCodec.elemType(kind), containsNull = false)

  override def createAggregationBuffer(): BoundedPairs =
    new BoundedPairs(n, keepSmallest, kind)

  override def merge(b1: BoundedPairs, b2: BoundedPairs): BoundedPairs = {
    val it = b2.heap.iterator()
    while (it.hasNext) { val p = it.next(); b1.add(p._1, p._2) }
    b1
  }

  override def serialize(buf: BoundedPairs): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeLong(p._1)
      VCodec.write(out, kind, p._2)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedPairs = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val m = in.readInt()
    var i = 0
    while (i < m) { buf.add(in.readLong(), VCodec.read(in, kind)); i += 1 }
    buf
  }
}

/** groupArraySorted(x, n): smallest n values ascending; the value is its
  * own sort key (keys all 0, ordering falls to the value comparator).
  */
case class GroupArraySortedAgg(
    valueExpr: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BoundedCollectAgg
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def left: Expression = valueExpr
  override def right: Expression = nExpr
  override def prettyName: String = "group_array_sorted"
  override protected def keepSmallest: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def update(buf: BoundedPairs, input: InternalRow): BoundedPairs = {
    val v = valueExpr.eval(input)
    if (v != null) buf.add(0L, VCodec.norm(kind, v))
    buf
  }

  override def eval(buf: BoundedPairs): Any =
    new GenericArrayData(buf.sorted.map(p => VCodec.out(kind, p._2)))

  override def withNewMutableAggBufferOffset(o: Int): GroupArraySortedAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArraySortedAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(valueExpr = l, nExpr = r)
}

/** groupArrayLast(sortKey, x, n): values at the n largest keys, emitted
  * ascending — the sort-key-contract reading of CH's insertion-order
  * "last n".
  */
case class GroupArrayLastAgg(
    sortKey: Expression,
    valueExpr: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BoundedCollectAgg
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def first: Expression = sortKey
  override def second: Expression = valueExpr
  override def third: Expression = nExpr
  override def prettyName: String = "group_array_last"
  override protected def keepSmallest: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = sortKey.dataType match {
    case LongType | IntegerType | ShortType | ByteType | TimestampType | DateType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"groupArrayLast sort key must be integral/timestamp, got ${t.sql}")
  }

  override def update(buf: BoundedPairs, input: InternalRow): BoundedPairs = {
    val k = sortKey.eval(input)
    val v = valueExpr.eval(input)
    if (k != null && v != null) buf.add(Num.toL(k), VCodec.norm(kind, v))
    buf
  }

  override def eval(buf: BoundedPairs): Any =
    new GenericArrayData(buf.sorted.map(p => VCodec.out(kind, p._2)))

  override def withNewMutableAggBufferOffset(o: Int): GroupArrayLastAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArrayLastAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(sortKey = a, valueExpr = b, nExpr = c)
}

/** groupArrayInsertAt(x, pos, default, size): x at position pos
  * (smallest value wins a collision), `default` elsewhere; size -1 =
  * grow to max pos+1. Buffer O(occupied positions).
  */
case class GroupArrayInsertAtAgg(
    valueExpr: Expression,
    posExpr: Expression,
    defaultExpr: Expression,
    sizeExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Integer, Any]]
  with org.apache.spark.sql.catalyst.trees.QuaternaryLike[Expression] {

  override def first: Expression = valueExpr
  override def second: Expression = posExpr
  override def third: Expression = defaultExpr
  override def fourth: Expression = sizeExpr
  override def prettyName: String = "group_array_insert_at"
  override def nullable: Boolean = false

  private lazy val kind = VCodec.kindOf(valueExpr.dataType, prettyName)
  private lazy val size: Int = VCodec.litInt(sizeExpr, "groupArrayInsertAt size")
  private lazy val dflt: Any = {
    require(defaultExpr.foldable, "groupArrayInsertAt default must be a literal")
    val v = defaultExpr.eval(null)
    if (v == null) null else VCodec.norm(kind, v)
  }
  private val MaxPos = 1 << 20 // loud cap: positions address an ARRAY

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(VCodec.elemType(kind), containsNull = true)

  override def createAggregationBuffer(): java.util.HashMap[Integer, Any] =
    new java.util.HashMap[Integer, Any]()

  override def update(buf: java.util.HashMap[Integer, Any],
      input: InternalRow): java.util.HashMap[Integer, Any] = {
    val v = valueExpr.eval(input)
    val p = posExpr.eval(input)
    if (v != null && p != null) {
      val pos = Num.toI(p)
      require(pos >= 0 && pos < MaxPos,
        s"groupArrayInsertAt position must be in [0, $MaxPos), got $pos")
      val nv = VCodec.norm(kind, v)
      val prev = buf.get(pos)
      if (prev == null || VCodec.lt(kind, nv, prev)) buf.put(pos, nv)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Integer, Any],
      b2: java.util.HashMap[Integer, Any]): java.util.HashMap[Integer, Any] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      if (prev == null || VCodec.lt(kind, e.getValue, prev))
        b1.put(e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Integer, Any]): Any = {
    import scala.jdk.CollectionConverters._
    val maxPos = if (buf.isEmpty) -1 else buf.keySet().asScala.map(_.intValue()).max
    val len = if (size >= 0) size else maxPos + 1
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      val v = buf.get(i)
      out(i) =
        if (v != null) VCodec.out(kind, v)
        else if (dflt != null) VCodec.out(kind, dflt)
        else null
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[Integer, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey)
      VCodec.write(out, kind, e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Integer, Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val m = in.readInt()
    var i = 0
    while (i < m) { buf.put(in.readInt(), VCodec.read(in, kind)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupArrayInsertAtAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArrayInsertAtAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) =
    copy(valueExpr = a, posExpr = b, defaultExpr = c, sizeExpr = d)
}

/** groupArraySample(x, n, seed): a DETERMINISTIC uniform sample — the n
  * values with the smallest sipHash64(seed-prefixed value bytes), i.e.
  * a bottom-k-by-hash sketch (the classic distinct-sampling
  * construction): order-free, mergeable, O(n) state, and the SAME
  * sample at any partitioning for a given seed — a strict upgrade of
  * CH's reservoir (whose sample depends on row order). Emitted in
  * ascending hash order (stable, pseudo-random relative to values).
  * Duplicate values hash identically and are kept up to n times via the
  * value tiebreak.
  */
case class GroupArraySampleAgg(
    valueExpr: Expression,
    nExpr: Expression,
    seedExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BoundedCollectAgg
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def first: Expression = valueExpr
  override def second: Expression = nExpr
  override def third: Expression = seedExpr
  override def prettyName: String = "group_array_sample"
  override protected def keepSmallest: Boolean = true

  private lazy val seed: Long = VCodec.litInt(seedExpr, "groupArraySample seed").toLong

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  private def hashOf(v: Any): Long = {
    val s = v match {
      case x: Long => java.lang.Long.toHexString(x)
      case x: Double => java.lang.Double.toHexString(x)
      case x: String => x
    }
    SipHash.hash64(seed, ~seed,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  override def update(buf: BoundedPairs, input: InternalRow): BoundedPairs = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val nv = VCodec.norm(kind, v)
      buf.add(hashOf(nv), nv)
    }
    buf
  }

  override def eval(buf: BoundedPairs): Any =
    new GenericArrayData(buf.sorted.map(p => VCodec.out(kind, p._2)))

  override def withNewMutableAggBufferOffset(o: Int): GroupArraySampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArraySampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(valueExpr = a, nExpr = b, seedExpr = c)
}
