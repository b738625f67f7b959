package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar special functions backing the hypothesis-test aggregates.
  * Regularized incomplete beta via the Lentz continued fraction — the
  * standard public formulation (Abramowitz & Stegun 26.5.8 / Numerical
  * Recipes §6.4); accurate to ~1e-14 over the t-test parameter range.
  */
object SpecialMath {
  private val FpMin = 1e-300
  private val Eps = 1e-15

  /** ln Γ(x) (Lanczos, g=7, 9 coefficients — public constants). */
  def lnGamma(x: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    } else {
      val xx = x - 1.0
      var a = g(0)
      val t = xx + 7.5
      var i = 1
      while (i < 9) { a += g(i) / (xx + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) return h
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def betaI(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val bt = math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      a * math.log(x) + b * math.log(1.0 - x))
    if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
    else 1.0 - bt * betacf(b, a, 1.0 - x) / b
  }

  /** Two-sided Student's t p-value: I_{df/(df+t^2)}(df/2, 1/2). */
  def studentP(t: Double, df: Double): Double = {
    if (df <= 0 || t.isNaN) return Double.NaN
    betaI(df / 2.0, 0.5, df / (df + t * t))
  }

  /** erfc via the standard 9-term Chebyshev fit (public; |err| < 1.2e-7). */
  def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
      t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
      t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0.0) ans else 2.0 - ans
  }

  /** Two-sided normal p-value for a z statistic. */
  def normalP(z: Double): Double =
    if (z.isNaN) Double.NaN else math.min(1.0, erfc(math.abs(z) / math.sqrt(2.0)))
}

/** `studentTTest(v, sample)` / `welchTTest(v, sample)` — ClickHouse's
  * two-sample location tests. `sample` must be 0 or 1; returns
  * struct(t_stat, p_value) (two-sided). Buffer = six moment sums (count /
  * Σv / Σv² per sample) — O(1) state, map-side combined; the t statistic
  * and Welch–Satterthwaite df come from the merged sums, the p-value from
  * the regularized incomplete beta ([[SpecialMath]]).
  */
case class TTestAgg(
    value: Expression,
    sample: Expression,
    welch: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = sample
  override def prettyName: String = if (welch) "welch_t_test" else "student_t_test"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("t_stat", DoubleType, nullable = false),
    StructField("p_value", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!value.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName value must be numeric")
    else if (!sample.dataType.isInstanceOf[IntegralType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName sample index must be 0/1 integer")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Double] = new Array[Double](6)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = value.eval(input)
    val s = sample.eval(input)
    if (v != null && s != null) {
      val x = Num.toD(v)
      val g = Num.toI(s)
      require(g == 0 || g == 1, s"$prettyName sample index must be 0 or 1, got $g")
      val off = g * 3
      buf(off) += 1.0; buf(off + 1) += x; buf(off + 2) += x * x
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 6) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    val n0 = buf(0); val n1 = buf(3)
    if (n0 < 2 || n1 < 2) return InternalRow(Double.NaN, Double.NaN)
    val m0 = buf(1) / n0; val m1 = buf(4) / n1
    val s0 = (buf(2) - n0 * m0 * m0) / (n0 - 1) // sample variances
    val s1 = (buf(5) - n1 * m1 * m1) / (n1 - 1)
    val (t, df) =
      if (welch) {
        val se = s0 / n0 + s1 / n1
        val tt = (m0 - m1) / math.sqrt(se)
        val dd = se * se /
          (s0 * s0 / (n0 * n0 * (n0 - 1)) + s1 * s1 / (n1 * n1 * (n1 - 1)))
        (tt, dd)
      } else {
        val sp = ((n0 - 1) * s0 + (n1 - 1) * s1) / (n0 + n1 - 2)
        val tt = (m0 - m1) / math.sqrt(sp * (1 / n0 + 1 / n1))
        (tt, n0 + n1 - 2)
      }
    InternalRow(t, SpecialMath.studentP(t, df))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < 6) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TTestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TTestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TTestAgg =
    copy(value = l, sample = r)
}

/** `meanZTest(v, sample01, varX, varY)` — ClickHouse's two-sample mean
  * z-test with KNOWN population variances (literal parameters):
  * z = (m0 − m1)/√(varX/n0 + varY/n1), two-sided p from the normal
  * tail. Same O(1) six-sum buffer as [[TTestAgg]].
  */
case class ZTestAgg(
    value: Expression,
    sample: Expression,
    varX: Double,
    varY: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = sample
  override def prettyName: String = "mean_z_test"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("z_stat", DoubleType, nullable = false),
    StructField("p_value", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!value.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName value must be numeric")
    else if (!sample.dataType.isInstanceOf[IntegralType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName sample index must be 0/1 integer")
    else if (varX <= 0.0 || varY <= 0.0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName variances must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Double] = new Array[Double](4)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = value.eval(input)
    val s = sample.eval(input)
    if (v != null && s != null) {
      val x = Num.toD(v)
      val g = Num.toI(s)
      require(g == 0 || g == 1, s"$prettyName sample index must be 0 or 1, got $g")
      buf(g * 2) += 1.0; buf(g * 2 + 1) += x
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 4) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    val n0 = buf(0); val n1 = buf(2)
    if (n0 < 1 || n1 < 1) return InternalRow(Double.NaN, Double.NaN)
    val z = (buf(1) / n0 - buf(3) / n1) / math.sqrt(varX / n0 + varY / n1)
    InternalRow(z, SpecialMath.normalP(z))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < 4) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ZTestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ZTestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZTestAgg =
    copy(value = l, sample = r)
}

/** Categorical-association family over a pair of columns:
  * `cramersV(x, y)`, `cramersVBiasCorrected(x, y)` (Bergsma 2013),
  * `theilsU(x, y)` (uncertainty coefficient U(X|Y)), `contingency(x, y)`.
  * Buffer = (x, y) → count map; state is O(distinct pairs) — the same
  * documented trade as the exact topK family (association targets are
  * label-like columns). χ² uses the marginal closed form
  * n·(Σ o²/(r_i·c_j) − 1), which needs only OBSERVED cells; every
  * summation runs in sorted key order, so the double — and the result —
  * is partitioning-exact.
  */
case class PairStatsAgg(
    x: Expression,
    y: Expression,
    stat: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[(String, String), java.lang.Long]]
  with BinaryLike[Expression] {

  override def left: Expression = x
  override def right: Expression = y
  override def prettyName: String = stat
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Set("cramers_v", "cramers_v_bias_corrected", "theils_u",
        "contingency").contains(stat))
      TypeCheckResult.TypeCheckFailure(s"unknown pair stat '$stat'")
    else TypeCheckResult.TypeCheckSuccess

  private def asKey(v: Any): String = v match {
    case u: UTF8String => u.toString
    case other => String.valueOf(other)
  }

  override def createAggregationBuffer(): java.util.HashMap[(String, String), java.lang.Long] =
    new java.util.HashMap()

  override def update(buf: java.util.HashMap[(String, String), java.lang.Long],
      input: InternalRow): java.util.HashMap[(String, String), java.lang.Long] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) {
      val k = (asKey(xv), asKey(yv))
      val prev = buf.get(k)
      buf.put(k, if (prev == null) 1L else prev + 1L)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[(String, String), java.lang.Long],
      b2: java.util.HashMap[(String, String), java.lang.Long]): java.util.HashMap[(String, String), java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[(String, String), java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    val cells = buf.asScala.toSeq.sortBy(_._1) // deterministic order
    if (cells.isEmpty) return 0.0
    val rows = cells.groupBy(_._1._1).view.mapValues(_.map(_._2.longValue()).sum)
      .toSeq.sortBy(_._1)
    val cols = cells.groupBy(_._1._2).view.mapValues(_.map(_._2.longValue()).sum)
      .toSeq.sortBy(_._1)
    val rowOf = rows.toMap
    val colOf = cols.toMap
    val n = rows.map(_._2).sum.toDouble
    val r = rows.length; val c = cols.length

    stat match {
      case "theils_u" =>
        // U(X|Y) = (H(X) − H(X|Y)) / H(X); natural-log units cancel.
        var hx = 0.0
        rows.foreach { case (_, rc) =>
          val p = rc / n; hx -= p * math.log(p)
        }
        if (hx == 0.0) return 0.0
        var hxy = 0.0 // Σ_j (c_j/n) H(X|y_j), accumulated cell-wise
        cells.foreach { case ((_, cy), cnt) =>
          val cj = colOf(cy).toDouble
          val pxGivenY = cnt.longValue() / cj
          hxy -= (cj / n) * pxGivenY * math.log(pxGivenY)
        }
        (hx - hxy) / hx
      case _ =>
        // χ² from observed cells: n·(Σ o²/(r_i·c_j) − 1)
        var s = 0.0
        cells.foreach { case ((rx, cy), cnt) =>
          val o = cnt.doubleValue()
          s += o * o / (rowOf(rx).toDouble * colOf(cy).toDouble)
        }
        val chi2 = n * (s - 1.0)
        stat match {
          case "cramers_v" =>
            val k = math.min(r - 1, c - 1)
            if (k <= 0) 0.0 else math.sqrt(chi2 / n / k)
          case "cramers_v_bias_corrected" =>
            if (n <= 1) return 0.0
            val phi2 = chi2 / n
            val phi2c = math.max(0.0,
              phi2 - (r - 1.0) * (c - 1.0) / (n - 1.0))
            val rc = r - (r - 1.0) * (r - 1.0) / (n - 1.0)
            val cc = c - (c - 1.0) * (c - 1.0) / (n - 1.0)
            val k = math.min(rc - 1.0, cc - 1.0)
            if (k <= 0) 0.0 else math.sqrt(phi2c / k)
          case _ => // contingency coefficient
            math.sqrt(chi2 / (chi2 + n))
        }
    }
  }

  override def serialize(buf: java.util.HashMap[(String, String), java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey._1); out.writeUTF(e.getKey._2)
      out.writeLong(e.getValue.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[(String, String), java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.put((in.readUTF(), in.readUTF()), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): PairStatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PairStatsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PairStatsAgg =
    copy(x = l, y = r)
}
