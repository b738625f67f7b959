package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared (sortKey, value) pair collection for the time-series aggregates
  * under graft's explicit-sort-key contract (see [[MovingAgg]]'s scaladoc
  * for why ClickHouse's row-order forms can't be reproduced on a
  * partition-parallel engine without one).
  */
abstract class SeriesPairAgg
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Double)]]
  with BinaryLike[Expression] {

  def sortKey: Expression
  def value: Expression

  override def left: Expression = sortKey
  override def right: Expression = value
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = sortKey.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (!keyOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName sort key must be integral/date/timestamp, got ${sortKey.dataType}")
    else if (!value.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName value must be numeric, got ${value.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[(Long, Double)] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[(Long, Double)] = {
    val k = sortKey.eval(input)
    val v = value.eval(input)
    if (k != null && v != null)
      buf += ((Num.toL(k), Num.toD(v)))
    buf
  }

  override def merge(b1: scala.collection.mutable.ArrayBuffer[(Long, Double)],
      b2: scala.collection.mutable.ArrayBuffer[(Long, Double)]): scala.collection.mutable.ArrayBuffer[(Long, Double)] =
    b1 ++= b2

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
}

/** `exponentialMovingAverage(sortKey, v, halfLife)` — the value of an
  * exponentially-weighted mean at the LATEST sort key:
  *
  *   ema = Σ v_i·2^((k_i − k_max)/h)  /  Σ 2^((k_i − k_max)/h)
  *
  * This closed form is what ClickHouse's recursive definition telescopes
  * to at the last point, and unlike the recursion it is order-free math —
  * the oracle is one SQL expression. Sums run in sorted (k, v) order, so
  * the double is partitioning-exact. O(rows-per-group) buffer, same
  * bounded-group contract as groupArray.
  */
case class EmaAgg(
    sortKey: Expression,
    value: Expression,
    halfLife: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SeriesPairAgg {

  override def prettyName: String = "exponential_moving_average"
  override def dataType: DataType = DoubleType

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)]): Any = {
    if (buf.isEmpty) return 0.0
    val sorted = buf.sortBy(identity)
    val kMax = sorted.last._1
    var num = 0.0
    var den = 0.0
    sorted.foreach { case (k, v) =>
      val w = math.pow(2.0, (k - kMax).toDouble / halfLife)
      num += v * w
      den += w
    }
    num / den
  }

  override def withNewMutableAggBufferOffset(o: Int): EmaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EmaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): EmaAgg =
    copy(sortKey = l, value = r)
}

/** `sparkbar(x, y, width[, minX, maxX])` — ClickHouse's sparkline
  * aggregate: bucket [minX, maxX] (data min/max when omitted) into
  * `width` cells, sum y per cell, render each cell as one of eight
  * block characters proportional to the cell's share of the max cell
  * (empty/zero cells render as a space). Sums run over the SORTED
  * pairs, so the string is partitioning-exact; the rendering rule is
  * the deterministic `ceil(8·s/maxS)` ladder (documented — CH's own
  * rounding is unspecified).
  */
case class SparkbarAgg(
    sortKey: Expression,
    value: Expression,
    width: Int,
    bounds: Option[(Long, Long)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SeriesPairAgg {

  override def prettyName: String = "sparkbar"
  override def dataType: DataType = StringType

  private val Blocks = "▁▂▃▄▅▆▇█"

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)]): Any = {
    if (buf.isEmpty || width <= 0)
      return org.apache.spark.unsafe.types.UTF8String.fromString("")
    val sorted = buf.sortBy(identity)
    val lo = bounds.map(_._1).getOrElse(sorted.head._1)
    val hi = bounds.map(_._2).getOrElse(sorted.last._1)
    val span = math.max(1L, hi - lo + 1)
    val sums = new Array[Double](width)
    sorted.foreach { case (k, v) =>
      if (k >= lo && k <= hi) {
        val b = math.min(width - 1, ((k - lo) * width / span).toInt)
        sums(b) += v
      }
    }
    var maxS = 0.0
    sums.foreach(s => if (s > maxS) maxS = s)
    val sb = new java.lang.StringBuilder(width)
    var i = 0
    while (i < width) {
      val s = sums(i)
      if (maxS <= 0.0 || s <= 0.0) sb.append(' ')
      else {
        val idx = math.min(8, math.ceil(8.0 * s / maxS).toInt)
        sb.append(Blocks.charAt(idx - 1))
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override def withNewMutableAggBufferOffset(o: Int): SparkbarAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SparkbarAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SparkbarAgg =
    copy(sortKey = l, value = r)
}

/** `largestTriangleThreeBuckets(x, y, n)` — Steinarsson's LTTB
  * downsampling (public thesis, 2013; ClickHouse ships it under the same
  * name): keep first and last point, split the middle into n−2 equal
  * buckets, and from each bucket keep the point forming the largest
  * triangle with the previously kept point and the next bucket's
  * centroid. Deterministic given the sorted contract (ties in area keep
  * the earliest point). Returns array<struct(x, y)> in x order.
  */
case class LttbAgg(
    sortKey: Expression,
    value: Expression,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends SeriesPairAgg {

  override def prettyName: String = "largest_triangle_three_buckets"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))), containsNull = false)

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Long, Double)]): Any = {
    val sorted = buf.sortBy(identity).toArray
    val nPts = sorted.length
    val out: Array[(Long, Double)] =
      if (buckets >= nPts || buckets <= 2 || nPts <= 2) sorted
      else {
        val res = new Array[(Long, Double)](buckets)
        res(0) = sorted(0)
        res(buckets - 1) = sorted(nPts - 1)
        // middle points 1..nPts-2 in buckets-2 equal ranges
        val mid = nPts - 2
        val nb = buckets - 2
        var prev = sorted(0)
        var b = 0
        while (b < nb) {
          val lo = 1 + (b.toLong * mid / nb).toInt
          val hi = 1 + ((b + 1).toLong * mid / nb).toInt // exclusive
          // next bucket centroid (or the final point for the last bucket)
          var cx = 0.0; var cy = 0.0
          if (b == nb - 1) { cx = sorted(nPts - 1)._1.toDouble; cy = sorted(nPts - 1)._2 }
          else {
            val nlo = 1 + ((b + 1).toLong * mid / nb).toInt
            val nhi = 1 + ((b + 2).toLong * mid / nb).toInt
            var i = nlo
            while (i < nhi) { cx += sorted(i)._1; cy += sorted(i)._2; i += 1 }
            val m = (nhi - nlo).toDouble
            cx /= m; cy /= m
          }
          var best = lo
          var bestArea = -1.0
          var i = lo
          while (i < hi) {
            val area = math.abs(
              (prev._1 - cx) * (sorted(i)._2 - prev._2) -
              (prev._1 - sorted(i)._1) * (cy - prev._2))
            if (area > bestArea) { bestArea = area; best = i }
            i += 1
          }
          res(b + 1) = sorted(best)
          prev = sorted(best)
          b += 1
        }
        res
      }
    new GenericArrayData(out.map { case (k, v) =>
      InternalRow(k.toDouble, v): Any
    })
  }

  override def withNewMutableAggBufferOffset(o: Int): LttbAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LttbAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LttbAgg =
    copy(sortKey = l, value = r)
}
