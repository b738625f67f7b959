package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", 2019) — the sketch behind ClickHouse's
  * `quantileTDigest`. Centroids are size-limited by the k1 scale function
  * k(q) = (δ/2π)·asin(2q−1), so bins are finest at the tails; rank error
  * is bounded by ~1/δ in the middle and shrinks toward the extremes.
  *
  * Scale contract: state is O(δ) doubles per group regardless of row
  * count, and states merge associatively enough for partial aggregation —
  * the estimate depends (slightly) on merge order, like every t-digest,
  * so the gated query asserts a rank-tolerance band rather than hashing
  * the estimate (the `uniq` convention).
  */
final class TDigest(val compression: Double) extends Serializable {
  // merged centroids, ascending by mean
  private[graft] var mean = new Array[Double](16)
  private[graft] var weight = new Array[Double](16)
  private[graft] var n = 0
  private[graft] var total = 0.0
  // unmerged incoming points
  private val bufCap = math.max(64, (4 * compression).toInt)
  private[graft] var bufMean = new Array[Double](bufCap)
  private[graft] var bufW = new Array[Double](bufCap)
  private[graft] var bufN = 0

  def add(x: Double, w: Double = 1.0): Unit = {
    if (java.lang.Double.isNaN(x)) return
    if (bufN == bufCap) compress()
    bufMean(bufN) = x
    bufW(bufN) = w
    bufN += 1
  }

  def mergeIn(o: TDigest): Unit = {
    o.compress()
    var i = 0
    while (i < o.n) { add(o.mean(i), o.weight(i)); i += 1 }
  }

  /** Fold the buffer into the centroid list under the k1 size limit. */
  def compress(): Unit = {
    if (bufN == 0) return
    // gather all (centroids + buffer), sort by mean
    val m = n + bufN
    val xs = new Array[Double](m)
    val ws = new Array[Double](m)
    System.arraycopy(mean, 0, xs, 0, n)
    System.arraycopy(weight, 0, ws, 0, n)
    System.arraycopy(bufMean, 0, xs, n, bufN)
    System.arraycopy(bufW, 0, ws, n, bufN)
    // indirect sort (stable) by mean
    val idx = Array.range(0, m).sortBy(xs(_))
    var tot = 0.0
    var i = 0
    while (i < m) { tot += ws(i); i += 1 }
    val outM = new Array[Double](m)
    val outW = new Array[Double](m)
    var on = 0
    var accW = 0.0   // weight already committed to finished centroids
    var curM = xs(idx(0))
    var curW = ws(idx(0))
    val norm = compression / (2.0 * math.Pi)
    def kOf(q: Double): Double = norm * math.asin(2.0 * math.min(1.0, q) - 1.0)
    var kLo = kOf(0.0)
    i = 1
    while (i < m) {
      val x = xs(idx(i))
      val w = ws(idx(i))
      val qNew = (accW + curW + w) / tot
      if (kOf(qNew) - kLo <= 1.0) {
        // merge into the current centroid (weighted mean)
        curM += (x - curM) * w / (curW + w)
        curW += w
      } else {
        outM(on) = curM
        outW(on) = curW
        on += 1
        accW += curW
        kLo = kOf(accW / tot)
        curM = x
        curW = w
      }
      i += 1
    }
    outM(on) = curM
    outW(on) = curW
    on += 1
    mean = java.util.Arrays.copyOf(outM, on)
    weight = java.util.Arrays.copyOf(outW, on)
    n = on
    total = tot
    bufN = 0
  }

  /** Quantile estimate with linear interpolation between centroid means. */
  def quantile(q: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return mean(0)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val half = weight(i) / 2.0
      if (cum + half >= target) {
        if (i == 0) return mean(0)
        // cum = weight before centroid i; a centroid's rank center sits at
        // cum(before it) + weight/2
        val prevHalf = weight(i - 1) / 2.0
        val cPrev = cum - prevHalf
        val cThis = cum + half
        val t = (target - cPrev) / math.max(cThis - cPrev, Double.MinPositiveValue)
        return mean(i - 1) + (mean(i) - mean(i - 1)) * math.min(1.0, math.max(0.0, t))
      }
      cum += weight(i)
      i += 1
    }
    mean(n - 1)
  }

  /** Centroid count after folding the buffer (spec hook: O(δ) bound). */
  def centroidCount: Int = {
    compress()
    n
  }

  def serialize(): Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(compression)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(mean(i)); out.writeDouble(weight(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new TDigest(in.readDouble())
    val m = in.readInt()
    d.mean = new Array[Double](math.max(16, m))
    d.weight = new Array[Double](math.max(16, m))
    d.n = m
    var tot = 0.0
    var i = 0
    while (i < m) {
      d.mean(i) = in.readDouble()
      d.weight(i) = in.readDouble()
      tot += d.weight(i)
      i += 1
    }
    d.total = tot
    d
  }
}

/** `quantileTDigest(x, level)` / `quantilesTDigest(x, l1, l2, ...)` —
  * ClickHouse's t-digest percentile. δ = 200 (CH default 100 doubled: the
  * gated query asserts a ±0.02 rank band, and 200 keeps worst-case rank
  * error an order of magnitude inside it).
  */
case class TDigestAgg(
    child: Expression,
    levels: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = levels
  override def prettyName: String = "quantile_tdigest"
  override def nullable: Boolean = false

  private def toD(v: Any): Double = v match {
    case dec: Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }

  private lazy val levelValues: Array[Double] = {
    require(levels.foldable, s"quantileTDigest levels must be literals, got $levels")
    levels.eval(null) match {
      case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
        arr.toObjectArray(levels.dataType.asInstanceOf[ArrayType].elementType)
          .map(toD)
      case other => Array(toD(other))
    }
  }
  private lazy val scalar: Boolean = !levels.dataType.isInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType =>
      val ok = levels.dataType match {
        case _: NumericType => true
        case ArrayType(_: NumericType, _) => true
        case _ => false
      }
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"quantileTDigest level(s) must be numeric, got ${levels.dataType}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantileTDigest expects a numeric column, got $t")
  }

  override def dataType: DataType =
    if (scalar) DoubleType else ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigest = new TDigest(200.0)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(toD(v))
    buf
  }

  override def merge(b1: TDigest, b2: TDigest): TDigest = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buf: TDigest): Any =
    if (scalar) buf.quantile(levelValues(0))
    else new GenericArrayData(levelValues.map(buf.quantile))

  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      TDigestAgg = copy(child = l, levels = r)
}

/** `quantileTDigestWeighted(x, w, level)` — ClickHouse's weighted
  * t-digest percentile: each value carries an integer repetition weight
  * (TDigest.add already takes a weight; rows with w <= 0 are skipped).
  * Same δ and envelope contract as [[TDigestAgg]].
  */
case class TDigestWeightedAgg(
    child: Expression,
    weight: Expression,
    levels: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def first: Expression = child
  override def second: Expression = weight
  override def third: Expression = levels
  override def prettyName: String = "quantile_tdigest_weighted"
  override def nullable: Boolean = false

  private lazy val level: Double = {
    require(levels.foldable, s"quantileTDigestWeighted level must be a literal, got $levels")
    Num.toD(levels.eval(null))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (_: NumericType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"quantileTDigestWeighted expects numeric (value, weight), got ($a, $b)")
    }

  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): TDigest = new TDigest(200.0)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wd = Num.toD(w)
      if (wd > 0) buf.add(Num.toD(v), wd)
    }
    buf
  }

  override def merge(b1: TDigest, b2: TDigest): TDigest = { b1.mergeIn(b2); b1 }

  override def eval(buf: TDigest): Any = buf.quantile(level)

  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestWeightedAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestWeightedAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): TDigestWeightedAgg = copy(child = a, weight = b, levels = c)
}
