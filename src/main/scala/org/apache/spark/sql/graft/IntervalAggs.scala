package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Interval sweep-line aggregates over (start, end) pairs, ClickHouse's
  * `maxIntersections` / `maxIntersectionsPosition` / `intervalLengthSum`.
  * Ends are EXCLUSIVE (the CH sweep orders a −1 end event before a +1
  * start event at the same point, so touching intervals don't stack —
  * documented here because CH leaves it implicit in the implementation).
  * Buffer = the group's pairs; eval sorts and sweeps once, so the result
  * is partitioning-exact. Degenerate/negative intervals (end ≤ start)
  * contribute nothing.
  */
case class IntervalAgg(
    start: Expression,
    end: Expression,
    stat: String, // max_intersections | max_intersections_position | interval_length_sum
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]]
  with BinaryLike[Expression] {

  override def left: Expression = start
  override def right: Expression = end
  override def prettyName: String = stat
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (!Set("max_intersections", "max_intersections_position",
        "interval_length_sum").contains(stat))
      TypeCheckResult.TypeCheckFailure(s"unknown interval stat '$stat'")
    else if (!ok(start) || !ok(end))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs integral/date/timestamp bounds, got " +
          s"${start.dataType}/${end.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def asLong(v: Any): Long = Num.toL(v)

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[(Long, Long)] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(buf: scala.collection.mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[(Long, Long)] = {
    val s = start.eval(input)
    val e = end.eval(input)
    if (s != null && e != null) {
      val sl = asLong(s); val el = asLong(e)
      // the sweep bit-packs point*2+delta into a Long; fail loudly rather
      // than silently corrupt event ordering past the packable range
      require(math.abs(sl) < (1L << 62) && math.abs(el) < (1L << 62),
        s"$prettyName bounds must be within ±2^62 (got $sl..$el)")
      if (el > sl) buf += ((sl, el))
    }
    buf
  }

  override def merge(b1: scala.collection.mutable.ArrayBuffer[(Long, Long)],
      b2: scala.collection.mutable.ArrayBuffer[(Long, Long)]): scala.collection.mutable.ArrayBuffer[(Long, Long)] =
    b1 ++= b2

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Long, Long)]): Any = {
    if (buf.isEmpty) return 0L
    if (stat == "interval_length_sum") {
      val sorted = buf.sortBy(identity)
      var total = 0L
      var curLo = sorted(0)._1
      var curHi = sorted(0)._2
      var i = 1
      while (i < sorted.length) {
        val (s, e) = sorted(i)
        if (s > curHi) { total += curHi - curLo; curLo = s; curHi = e }
        else if (e > curHi) curHi = e
        i += 1
      }
      total + (curHi - curLo)
    } else {
      // sweep: (+1 at start, -1 at end), end events first at equal points
      val events = new Array[Long](buf.length * 2) // packed (point, delta)
      var i = 0
      buf.foreach { case (s, e) =>
        events(i) = s * 2 + 1; events(i + 1) = e * 2 // LSB 1 = start
        i += 2
      }
      java.util.Arrays.sort(events) // point asc; end (LSB 0) before start
      var cur = 0L
      var best = 0L
      var bestPos = 0L
      i = 0
      while (i < events.length) {
        val isStart = (events(i) & 1L) == 1L
        if (isStart) {
          cur += 1
          if (cur > best) { best = cur; bestPos = events(i) >> 1 }
        } else cur -= 1
        i += 1
      }
      if (stat == "max_intersections") best else bestPos
    }
  }

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, e) => out.writeLong(s); out.writeLong(e) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    buf.sizeHint(n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): IntervalAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IntervalAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntervalAgg =
    copy(start = l, end = r)
}

/** `modeExact(x)` — the most frequent value; ties break to the SMALLEST
  * value, making the result deterministic where ClickHouse's `anyHeavy`
  * (registered as an alias) is explicitly approximate and order-
  * dependent. Buffer = value→count map (O(distinct), the exact-topK
  * trade).
  */
case class ModeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[AnyRef, java.lang.Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "mode_exact"
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"modeExact supports string|bigint|int values, got $t")
  }

  private lazy val keyIsString = child.dataType == StringType

  override def createAggregationBuffer(): java.util.HashMap[AnyRef, java.lang.Long] =
    new java.util.HashMap()

  override def update(buf: java.util.HashMap[AnyRef, java.lang.Long],
      input: InternalRow): java.util.HashMap[AnyRef, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key: AnyRef = v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
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
    if (buf.isEmpty) return null
    val entries = buf.asScala.toSeq
    val best =
      if (keyIsString)
        entries.minBy { case (k, c) => (-c.longValue(), k.asInstanceOf[String]) }._1
      else
        entries.minBy { case (k, c) =>
          (-c.longValue(), k.asInstanceOf[java.lang.Long].longValue())
        }._1
    best match {
      case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case l: java.lang.Long =>
        if (child.dataType == IntegerType) java.lang.Integer.valueOf(l.intValue())
        else l
    }
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

  override def withNewMutableAggBufferOffset(o: Int): ModeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ModeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ModeAgg =
    copy(child = c)
}
