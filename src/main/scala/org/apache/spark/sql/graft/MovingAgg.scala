package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ClickHouse `groupArrayMovingSum`/`groupArrayMovingAvg` under graft's
  * explicit-sort-key contract.
  *
  * ClickHouse's forms take bare values and emit the moving aggregate in
  * ROW ORDER — order-sensitive, so their result depends on read order
  * unless the caller funnels through a single-threaded ORDER BY. Spark
  * aggregates see rows in partition-arbitrary order, and graft's
  * determinism audit re-runs every query at two partition counts — so,
  * exactly like the funnel/sequence family ([[WindowFunnelAgg]]), the
  * graft spelling takes the sort key explicitly:
  *
  *   groupArrayMovingSum(sortKey, value[, winSize])
  *   groupArrayMovingAvg(sortKey, value[, winSize])
  *
  * Buffer = the group's (sortKey, value) pairs (same bounded-group
  * contract as groupArray); merge = concat (commutative up to the final
  * sort); eval = sort by (sortKey, value) — deterministic whenever key
  * ties carry equal values — then one linear moving-window pass.
  * `winSize` ≤ 0 or omitted = unbounded window (CH's default: running
  * totals). Sums run left-to-right over the sorted sequence, so the
  * result is identical for ANY partitioning of the input.
  *
  * Equivalent closed form (the oracle): `sum(v) OVER (PARTITION BY g
  * ORDER BY sortKey, v ROWS BETWEEN winSize-1 PRECEDING AND CURRENT
  * ROW)` collected in sort order.
  */
case class MovingAgg(
    sortKey: Expression,
    value: Expression,
    winSize: Int,
    mode: Int, // MovingAgg.{ModeSum,ModeAvg,ModeDeltaSum}
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Double)]]
  with BinaryLike[Expression] {

  private def avg: Boolean = mode == MovingAgg.ModeAvg
  private def deltaSum: Boolean = mode == MovingAgg.ModeDeltaSum

  override def left: Expression = sortKey
  override def right: Expression = value
  override def prettyName: String =
    if (deltaSum) "delta_sum"
    else if (avg) "group_array_moving_avg" else "group_array_moving_sum"
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (deltaSum) DoubleType
    else ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = sortKey.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    val valOk = value.dataType match {
      case _: NumericType => true
      case _ => false
    }
    if (!keyOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName sort key must be integral/date/timestamp, got ${sortKey.dataType}")
    else if (!valOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName value must be numeric, got ${value.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def keyAsLong(k: Any): Long = k match {
    case l: java.lang.Long    => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short   => s.longValue()
    case b: java.lang.Byte    => b.longValue()
    case other                => Num.toL(other)
  }

  private def valAsDouble(v: Any): Double = v match {
    case d: java.lang.Double => d.doubleValue()
    case n: Number           => n.doubleValue()
    case dec: Decimal        => dec.toDouble
  }

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[(Long, Double)] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[(Long, Double)] = {
    val k = sortKey.eval(input)
    val v = value.eval(input)
    if (k != null && v != null) buf += ((keyAsLong(k), valAsDouble(v)))
    buf
  }

  override def merge(b1: scala.collection.mutable.ArrayBuffer[(Long, Double)],
      b2: scala.collection.mutable.ArrayBuffer[(Long, Double)]): scala.collection.mutable.ArrayBuffer[(Long, Double)] =
    b1 ++= b2

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)]): Any = {
    val sorted = buf.sortBy(identity) // (key, value) — deterministic
    val n = sorted.length
    if (deltaSum) {
      // CH deltaSum under the sorted contract: sum of positive steps
      var acc = 0.0
      var i = 1
      while (i < n) {
        val d = sorted(i)._2 - sorted(i - 1)._2
        if (d > 0) acc += d
        i += 1
      }
      return acc
    }
    val out = new Array[Any](n)
    var run = 0.0
    var i = 0
    while (i < n) {
      run += sorted(i)._2
      if (winSize > 0 && i >= winSize) run -= sorted(i - winSize)._2
      val width = if (winSize > 0) math.min(i + 1, winSize) else i + 1
      out(i) = if (avg) run / width else run
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (k, v) => out.writeLong(k); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    buf.sizeHint(n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MovingAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MovingAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MovingAgg =
    copy(sortKey = l, value = r)
}

object MovingAgg {
  val ModeSum = 0
  val ModeAvg = 1
  val ModeDeltaSum = 2

  /** Registry builder: 2-arg = unbounded window, 3-arg = fixed window
    * (a foldable positive integer, the CH parametric position).
    */
  def build(e: Seq[Expression], mode: Int): MovingAgg = {
    val win = if (e.length < 3) 0 else e(2) match {
      case Literal(v, IntegerType) => v.asInstanceOf[Int]
      case Literal(v, LongType)    => v.asInstanceOf[Long].toInt
      case other => throw new IllegalArgumentException(
        "groupArrayMoving* window size must be an integer literal, got: " + other)
    }
    MovingAgg(e(0), e(1), win, mode)
  }
}
