package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Rank-based two-column statistics: `rankCorr(x, y)` (Spearman with
  * average-rank ties), `kolmogorovSmirnovTest(v, sample01)` →
  * struct(d_statistic, p_value), `mannWhitneyUTest(v, sample01)` →
  * struct(u_statistic, p_value). One buffer shape for all three: the
  * group's (a, b) pairs (bounded-group contract, like groupArray — CH's
  * own implementations hold the same state). Every pass runs over the
  * SORTED pairs, so results are partitioning-exact; p-values use public
  * asymptotic forms (KS: the Kolmogorov series with Stephens' small-n
  * correction; MWU: normal approximation with tie correction).
  */
case class RankStatsAgg(
    a: Expression,
    b: Expression,
    stat: String, // rank_corr | ks_test | mwu_test
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Double)]]
  with BinaryLike[Expression] {

  override def left: Expression = a
  override def right: Expression = b
  override def prettyName: String = stat
  override def nullable: Boolean = false
  override def dataType: DataType = stat match {
    case "rank_corr" => DoubleType
    case "ks_test" => StructType(Seq(
      StructField("d_statistic", DoubleType, nullable = false),
      StructField("p_value", DoubleType, nullable = false)))
    case _ => StructType(Seq(
      StructField("u_statistic", DoubleType, nullable = false),
      StructField("p_value", DoubleType, nullable = false)))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Set("rank_corr", "ks_test", "mwu_test").contains(stat))
      TypeCheckResult.TypeCheckFailure(s"unknown rank stat '$stat'")
    else if (!a.dataType.isInstanceOf[NumericType] ||
             !b.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs numeric inputs")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[(Double, Double)] =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(buf: scala.collection.mutable.ArrayBuffer[(Double, Double)],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[(Double, Double)] = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av != null && bv != null) {
      val x = Num.toD(av)
      val y = Num.toD(bv)
      if (stat != "rank_corr") {
        val g = y.toInt
        require(g == 0 || g == 1, s"$prettyName sample index must be 0 or 1, got $g")
      }
      buf += ((x, y))
    }
    buf
  }

  override def merge(b1: scala.collection.mutable.ArrayBuffer[(Double, Double)],
      b2: scala.collection.mutable.ArrayBuffer[(Double, Double)]): scala.collection.mutable.ArrayBuffer[(Double, Double)] =
    b1 ++= b2

  /** Average ranks (1-based) of `vals` in its own sorted order. */
  private def avgRanks(vals: Array[Double]): Array[Double] = {
    val n = vals.length
    val idx = Array.range(0, n).sortBy(vals(_))
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && vals(idx(j + 1)) == vals(idx(i))) j += 1
      val r = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
      var k = i
      while (k <= j) { ranks(idx(k)) = r; k += 1 }
      i = j + 1
    }
    ranks
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[(Double, Double)]): Any = {
    val sorted = buf.sortBy(identity).toArray
    stat match {
      case "rank_corr" =>
        val n = sorted.length
        if (n < 2) return 0.0
        val rx = avgRanks(sorted.map(_._1))
        val ry = avgRanks(sorted.map(_._2))
        // Pearson over ranks, in sorted-pair order (deterministic)
        var sx = 0.0; var sy = 0.0
        rx.foreach(sx += _); ry.foreach(sy += _)
        val mx = sx / n; val my = sy / n
        var cxy = 0.0; var vx = 0.0; var vy = 0.0
        var i = 0
        while (i < n) {
          val dx = rx(i) - mx; val dy = ry(i) - my
          cxy += dx * dy; vx += dx * dx; vy += dy * dy
          i += 1
        }
        if (vx == 0.0 || vy == 0.0) 0.0 else cxy / math.sqrt(vx * vy)

      case "ks_test" =>
        val s0 = sorted.collect { case (v, g) if g == 0.0 => v }
        val s1 = sorted.collect { case (v, g) if g == 1.0 => v }
        val n0 = s0.length; val n1 = s1.length
        if (n0 == 0 || n1 == 0) return InternalRow(Double.NaN, Double.NaN)
        var i = 0; var j = 0; var d = 0.0
        while (i < n0 || j < n1) {
          val v = if (j >= n1 || (i < n0 && s0(i) <= s1(j))) s0(i) else s1(j)
          while (i < n0 && s0(i) == v) i += 1
          while (j < n1 && s1(j) == v) j += 1
          val diff = math.abs(i.toDouble / n0 - j.toDouble / n1)
          if (diff > d) d = diff
        }
        val ne = n0.toDouble * n1 / (n0 + n1)
        val lambda = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
        InternalRow(d, ksQ(lambda))

      case _ => // mwu_test: U of sample 0, normal approx with tie correction
        val n = sorted.length
        val n0 = sorted.count(_._2 == 0.0).toDouble
        val n1 = n - n0
        if (n0 == 0 || n1 == 0) return InternalRow(Double.NaN, Double.NaN)
        val ranks = avgRanks(sorted.map(_._1))
        var r0 = 0.0
        var i = 0
        while (i < n) { if (sorted(i)._2 == 0.0) r0 += ranks(i); i += 1 }
        val u = r0 - n0 * (n0 + 1) / 2.0
        // tie term: sum over tie groups of t^3 - t
        var tieSum = 0.0
        i = 0
        while (i < n) {
          var j = i
          while (j + 1 < n && sorted(j + 1)._1 == sorted(i)._1) j += 1
          val t = (j - i + 1).toDouble
          tieSum += t * t * t - t
          i = j + 1
        }
        val mu = n0 * n1 / 2.0
        val sig2 = n0 * n1 / 12.0 *
          ((n + 1.0) - tieSum / (n.toDouble * (n - 1.0)))
        val p =
          if (sig2 <= 0.0) 1.0
          else {
            val z = (u - mu) / math.sqrt(sig2)
            2.0 * 0.5 * erfc(math.abs(z) / math.sqrt(2.0))
          }
        InternalRow(u, math.min(1.0, p))
    }
  }

  /** Kolmogorov asymptotic tail Q(λ) = 2 Σ (−1)^{j−1} e^{−2 j² λ²}. */
  private def ksQ(lambda: Double): Double = {
    if (lambda < 1e-10) return 1.0
    var sum = 0.0
    var j = 1
    var term = 0.0
    do {
      term = 2.0 * (if (j % 2 == 1) 1.0 else -1.0) *
        math.exp(-2.0 * j * j * lambda * lambda)
      sum += term
      j += 1
    } while (math.abs(term) > 1e-12 && j < 200)
    math.max(0.0, math.min(1.0, sum))
  }

  /** erfc via the A&S 7.1.26-style rational approximation refined with
    * the standard 9-term Chebyshev fit (public; |err| < 1.2e-7).
    */
  private def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
      t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
      t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0.0) ans else 2.0 - ans
  }

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (x, y) => out.writeDouble(x); out.writeDouble(y) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[(Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    buf.sizeHint(n)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): RankStatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RankStatsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RankStatsAgg =
    copy(a = l, b = r)
}
