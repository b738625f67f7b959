package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The ClickHouse behavioral aggregates as FIRST-CLASS SQL aggregate
  * functions — the exact surface a ClickHouse user writes:
  *
  * {{{
  *   SELECT user_id,
  *     windowFunnel(86400, ts, et='view', et='click', et='purchase')
  *   FROM events GROUP BY user_id
  * }}}
  *
  * (ClickHouse's parametric call shape `windowFunnel(86400)(ts, …)` does
  * not parse in Spark, so the parameters lead the argument list — same
  * convention as `quantileExact(x, level)` in this dialect.) The
  * DataFrame operators ([[graft.operators.Funnel]]) and these aggregates
  * share the [[FunnelDp]] kernels; the aggregate buffer is the packed
  * (ts, stage) pair list of MATCHED events only, built incrementally and
  * merged by concatenation — sorted once at eval, so partial aggregation
  * and shuffle behave exactly like the operator path's collect_list
  * without materializing struct rows.
  *
  * Windows and (?t) pattern constraints are in SECONDS (the ClickHouse
  * DateTime unit); `ts` is a Spark timestamp (internally epoch-micros).
  */
object BehavioralAggs {
  /** Packed growable (ts, stage) pairs; merge = concat, sort at eval. */
  final class Buf(var ts: Array[Long], var st: Array[Int], var n: Int) {
    def this() = this(new Array[Long](8), new Array[Int](8), 0)
    def add(t: Long, s: Int): Unit = {
      if (n == ts.length) {
        ts = java.util.Arrays.copyOf(ts, n * 2)
        st = java.util.Arrays.copyOf(st, n * 2)
      }
      ts(n) = t; st(n) = s; n += 1
    }
    /** Sort pairs by (ts, stage) — the repo-wide deterministic order. */
    def sorted(): Buf = {
      val idx = Array.range(0, n).sortBy(i => (ts(i), st(i)))
      val t2 = new Array[Long](n); val s2 = new Array[Int](n)
      var i = 0
      while (i < n) { t2(i) = ts(idx(i)); s2(i) = st(idx(i)); i += 1 }
      new Buf(t2, s2, n)
    }
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 12)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ts(i)); bb.putInt(buf.st(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ts = new Array[Long](n max 8); val st = new Array[Int](n max 8)
    var i = 0
    while (i < n) { ts(i) = bb.getLong; st(i) = bb.getInt; i += 1 }
    new Buf(ts, st, n)
  }

  /** Foldable numeric child → long, at construction. */
  def foldLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal, got $e")
    e.eval(null) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$what must be numeric, got $other")
    }
  }

  /** Foldable string child → String, at construction. */
  def foldString(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a string literal, got $e")
    Option(e.eval(null)).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"$what must not be NULL"))
  }
}

/** Common plumbing: evaluate ts + conds per row, buffer matched events. */
abstract class EventsAgg extends TypedImperativeAggregate[BehavioralAggs.Buf] {
  /** Index of the ts child in `children`; conds follow it. */
  protected def tsIndex: Int
  protected def tsExpr: Expression = children(tsIndex)
  protected def conds: Seq[Expression] = children.drop(tsIndex + 1)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (tsExpr.dataType != TimestampType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a timestamp, got ${tsExpr.dataType}")
    if (conds.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs at least one condition")
    conds.find(_.dataType != BooleanType)
      .map(c => TypeCheckResult.TypeCheckFailure(
        s"$prettyName conditions must be boolean, got ${c.dataType}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def createAggregationBuffer(): BehavioralAggs.Buf =
    new BehavioralAggs.Buf()

  override def update(buf: BehavioralAggs.Buf,
      input: InternalRow): BehavioralAggs.Buf = {
    val t = tsExpr.eval(input)
    if (t != null) {
      var s = 0
      var i = 0
      while (i < conds.length && s == 0) {
        if (conds(i).eval(input) == true) s = i + 1
        i += 1
      }
      if (s > 0) buf.add(t.asInstanceOf[Long], s)
    }
    buf
  }

  override def merge(b1: BehavioralAggs.Buf,
      b2: BehavioralAggs.Buf): BehavioralAggs.Buf = {
    var i = 0
    while (i < b2.n) { b1.add(b2.ts(i), b2.st(i)); i += 1 }
    b1
  }

  override def serialize(buf: BehavioralAggs.Buf): Array[Byte] =
    BehavioralAggs.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BehavioralAggs.Buf =
    BehavioralAggs.deserialize(bytes)
}

/** `windowFunnel(window_seconds, ts, cond1, …)` → max funnel level. */
case class WindowFunnelAgg(children: Seq[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends EventsAgg {
  override protected def tsIndex: Int = 1
  override def dataType: DataType = IntegerType
  override def prettyName: String = "windowfunnel"
  private lazy val windowMicros =
    BehavioralAggs.foldLong(children.head, "windowFunnel window") * 1000000L

  override def eval(buf: BehavioralAggs.Buf): Any = {
    val s = buf.sorted()
    FunnelDp.level(s.ts, s.st, s.n, windowMicros, conds.length)
  }
  override def withNewMutableAggBufferOffset(o: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): WindowFunnelAgg = copy(children = c)
}

/** `sequenceMatch('pattern', ts, cond1, …)` → boolean (full pattern
  * language — see [[SequencePattern]]).
  */
case class SequenceMatchAgg(children: Seq[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends EventsAgg {
  override protected def tsIndex: Int = 1
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sequencematch"
  private lazy val steps = {
    val st = SequencePattern.parse(
      BehavioralAggs.foldString(children.head, "sequenceMatch pattern"))
    st.foreach(s => require(s.cond >= 1 && s.cond <= conds.length,
      s"pattern references (?${s.cond}) but only ${conds.length} conditions given"))
    st
  }

  override def eval(buf: BehavioralAggs.Buf): Any = {
    val s = buf.sorted()
    FunnelDp.patternMatch(s.ts, s.st, s.n, steps)
  }
  override def withNewMutableAggBufferOffset(o: Int): SequenceMatchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceMatchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SequenceMatchAgg = copy(children = c)
}

/** `sequenceCount('pattern', ts, cond1, …)` → greedy non-overlapping
  * match count. Chain-form patterns only (`(?1).*(?2)…` — every step
  * gapped, in stage order, no time constraints), the [[ChainCount]]
  * semantics; ClickHouse's generalized counting over arbitrary patterns
  * is not supported.
  */
case class SequenceCountAgg(children: Seq[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends EventsAgg {
  override protected def tsIndex: Int = 1
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sequencecount"
  private lazy val nSteps = {
    val st = SequencePattern.parse(
      BehavioralAggs.foldString(children.head, "sequenceCount pattern"))
    require(st.zipWithIndex.forall { case (s, i) =>
      s.cond == i + 1 && s.gapBefore && s.constraints.isEmpty },
      "sequenceCount supports chain-form patterns only: '(?1).*(?2)...' " +
        "(every step gapped, in order, no time constraints)")
    require(st.length == conds.length,
      s"pattern has ${st.length} steps but ${conds.length} conditions given")
    st.length
  }

  override def eval(buf: BehavioralAggs.Buf): Any = {
    val s = buf.sorted()
    FunnelDp.chainCount(s.ts, s.st, s.n, nSteps)
  }
  override def withNewMutableAggBufferOffset(o: Int): SequenceCountAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceCountAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SequenceCountAgg = copy(children = c)
}

/** `retention(cond1, …)` → array<int> flags: r1 = cond1 ever held;
  * ri = r1 AND condi ever held (flags, not a sequence — ClickHouse
  * `retention`). Buffer is ONE long bitmask per group per partition.
  */
case class RetentionAgg(children: Seq[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.lang.Long] {
  require(children.nonEmpty && children.length <= 63,
    "retention takes 1..63 conditions")
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "retention"

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != BooleanType)
      .map(c => TypeCheckResult.TypeCheckFailure(
        s"retention conditions must be boolean, got ${c.dataType}"))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def createAggregationBuffer(): java.lang.Long = 0L

  override def update(buf: java.lang.Long, input: InternalRow): java.lang.Long = {
    var bits = buf.longValue()
    var i = 0
    while (i < children.length) {
      if (children(i).eval(input) == true) bits |= (1L << i)
      i += 1
    }
    bits
  }

  override def merge(b1: java.lang.Long, b2: java.lang.Long): java.lang.Long =
    b1.longValue() | b2.longValue()

  override def eval(buf: java.lang.Long): Any = {
    val bits = buf.longValue()
    val r1 = (bits & 1L) != 0
    new GenericArrayData(Array.tabulate[Any](children.length) { i =>
      if (i == 0) { if (r1) 1 else 0 }
      else if (r1 && (bits & (1L << i)) != 0) 1 else 0
    })
  }

  override def serialize(buf: java.lang.Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(buf.longValue()).array()
  override def deserialize(bytes: Array[Byte]): java.lang.Long =
    ByteBuffer.wrap(bytes).getLong

  override def withNewMutableAggBufferOffset(o: Int): RetentionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RetentionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): RetentionAgg = copy(children = c)
}
