package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `quantileBFloat16(x, level)` — ClickHouse's bfloat16 quantile sketch,
  * in a MERGE-ORDER-INDEPENDENT formulation: each value is quantized to
  * bfloat16 (float32 with the mantissa truncated to 8 bits — the top 16
  * bits of the float pattern, CH's own quantization), counts accumulate
  * in a bounded histogram (≤ 65536 distinct patterns), and the quantile
  * is the type-1 inverse CDF over the quantized multiset (smallest
  * quantized value whose cumulative count reaches ceil(level·N)).
  * Deterministic at any partitioning — unlike a reservoir — with CH's
  * ~0.4% relative quantization envelope (spec-gated vs exact).
  */
case class QuantileBF16Agg(
    child: Expression,
    levels: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Integer, java.lang.Long]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = levels
  override def prettyName: String = "quantile_bfloat16"
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  private lazy val level: Double = {
    require(levels.foldable, s"quantileBFloat16 level must be a literal")
    Num.toD(levels.eval(null))
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantileBFloat16 expects a numeric column, got ${t.sql}")
  }

  /** Top 16 bits of the float32 pattern (truncation, like CH). */
  private def bf16(x: Double): Int =
    (java.lang.Float.floatToIntBits(x.toFloat) >>> 16) & 0xffff

  private def back(bits: Int): Double =
    java.lang.Float.intBitsToFloat(bits << 16).toDouble

  override def createAggregationBuffer(): java.util.HashMap[Integer, java.lang.Long] =
    new java.util.HashMap[Integer, java.lang.Long]()

  override def update(buf: java.util.HashMap[Integer, java.lang.Long],
      input: InternalRow): java.util.HashMap[Integer, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = bf16(Num.toD(v))
      val prev = buf.get(k)
      buf.put(k, if (prev == null) 1L else prev + 1L)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Integer, java.lang.Long],
      b2: java.util.HashMap[Integer, java.lang.Long]): java.util.HashMap[Integer, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Integer, java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    if (buf.isEmpty) return Double.NaN
    val entries = buf.asScala.toArray.map { case (k, c) => (back(k), c.longValue()) }
    scala.util.Sorting.stableSort(entries,
      (a: (Double, Long), b: (Double, Long)) => a._1 < b._1)
    val total = entries.map(_._2).sum
    val target = math.max(1L, math.ceil(level * total).toLong)
    var cum = 0L
    var i = 0
    while (i < entries.length) {
      cum += entries(i)._2
      if (cum >= target) return entries(i)._1
      i += 1
    }
    entries.last._1
  }

  override def serialize(buf: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.put(in.readInt(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileBF16Agg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileBF16Agg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(child = l, levels = r)
}

/** `categoricalInformationValue(cat, tag)` — the credit-scoring IV
  * statistic: Σ over categories of (g/G − b/B)·ln((g·B)/(b·G)), where
  * g/b are the per-category counts with tag=1 ("good") / tag=0 and G/B
  * the totals. Categories with a zero side are SKIPPED (the
  * conventional rule — the term is otherwise ±∞). Each term is rounded
  * to 1e-8 units and summed as an exact integer, so the result is
  * partitioning-exact AND oracle-expressible (the q133 micro-rounding
  * recipe); the quantization is far below any analytical use of IV.
  * Buffer: one (good, bad) pair per category.
  */
case class CategoricalIVAgg(
    cat: Expression,
    tag: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
  with BinaryLike[Expression] {

  override def left: Expression = cat
  override def right: Expression = tag
  override def prettyName: String = "categorical_information_value"
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  override def update(buf: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val c = cat.eval(input)
    val t = tag.eval(input)
    if (c != null && t != null) {
      val g = Num.toI(t)
      require(g == 0 || g == 1,
        s"categoricalInformationValue tag must be 0 or 1, got $g")
      val key = c.toString
      var arr = buf.get(key)
      if (arr == null) { arr = new Array[Long](2); buf.put(key, arr) }
      arr(g) += 1L
    }
    buf
  }

  override def merge(b1: java.util.HashMap[String, Array[Long]],
      b2: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      if (prev == null) b1.put(e.getKey, e.getValue)
      else { prev(0) += e.getValue()(0); prev(1) += e.getValue()(1) }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    import scala.jdk.CollectionConverters._
    var goodTot = 0L
    var badTot = 0L
    buf.values().asScala.foreach { a => badTot += a(0); goodTot += a(1) }
    if (goodTot == 0L || badTot == 0L) return 0.0
    var ivMicro = 0L // 1e-8 units, exact integer sum — order-free
    buf.values().asScala.foreach { a =>
      val b = a(0); val g = a(1)
      if (b > 0L && g > 0L) {
        val term = (g.toDouble / goodTot - b.toDouble / badTot) *
          math.log((g.toDouble * badTot) / (b.toDouble * goodTot))
        ivMicro += math.round(term * 1e8)
      }
    }
    ivMicro / 1e8
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = in.readUTF()
      buf.put(k, Array(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CategoricalIVAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CategoricalIVAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(cat = l, tag = r)
}

/** `histogram(x, N)` — CH's adaptive histogram as a SQL aggregate, in a
  * MERGE-ORDER-INDEPENDENT reformulation (CH's own streaming
  * Ben-Haim/Tom-Tov sketch is order-sensitive, which is why rounds 10's
  * q183/q184 gated the two-pass operator instead): the aggregation
  * state is the exact bfloat16-quantized histogram (<= 65536 buckets,
  * exact counts, commutative merges); the N-bin adaptive merge runs
  * ONCE at eval over the sorted buckets — greedily merging the
  * narrowest adjacent pair (leftmost on ties), which is deterministic.
  * Returns array<struct(lo, hi, height)> like CH; bin edges carry the
  * bf16 quantization (~0.4% relative), heights are exact counts.
  */
case class HistogramAgg(
    child: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Integer, java.lang.Long]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = nExpr
  override def prettyName: String = "histogram"
  override def nullable: Boolean = false

  private lazy val nBins: Int = {
    require(nExpr.foldable, "histogram bin count must be a literal")
    val v = Num.toI(nExpr.eval(null))
    require(v > 0 && v <= 4096, s"histogram bin count must be in [1, 4096], got $v")
    v
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"histogram expects a numeric column, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lo", DoubleType, nullable = false),
    StructField("hi", DoubleType, nullable = false),
    StructField("height", DoubleType, nullable = false))), containsNull = false)

  private def bf16(x: Double): Int =
    (java.lang.Float.floatToIntBits(x.toFloat) >>> 16) & 0xffff
  private def back(bits: Int): Double =
    java.lang.Float.intBitsToFloat(bits << 16).toDouble

  override def createAggregationBuffer(): java.util.HashMap[Integer, java.lang.Long] =
    new java.util.HashMap[Integer, java.lang.Long]()

  override def update(buf: java.util.HashMap[Integer, java.lang.Long],
      input: InternalRow): java.util.HashMap[Integer, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = bf16(Num.toD(v))
      val prev = buf.get(k)
      buf.put(k, if (prev == null) 1L else prev + 1L)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Integer, java.lang.Long],
      b2: java.util.HashMap[Integer, java.lang.Long]): java.util.HashMap[Integer, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Integer, java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    if (buf.isEmpty) return new GenericArrayData(Array.empty[Any])
    // sorted (value, count) buckets
    val bk = buf.asScala.toArray.map { case (k, c) => (back(k), c.longValue()) }
    scala.util.Sorting.stableSort(bk,
      (a: (Double, Long), b: (Double, Long)) => a._1 < b._1)
    // each starts as a degenerate [v, v] bin; greedily merge the
    // narrowest adjacent pair (leftmost tie) until <= N remain
    val lo = scala.collection.mutable.ArrayBuffer(bk.map(_._1).toSeq: _*)
    val hi = scala.collection.mutable.ArrayBuffer(bk.map(_._1).toSeq: _*)
    val cnt = scala.collection.mutable.ArrayBuffer(bk.map(_._2).toSeq: _*)
    while (lo.length > nBins) {
      var best = 0
      var bestW = hi(1) - lo(0)
      var i = 1
      while (i < lo.length - 1) {
        val w = hi(i + 1) - lo(i)
        if (w < bestW) { bestW = w; best = i }
        i += 1
      }
      hi(best) = hi(best + 1)
      cnt(best) += cnt(best + 1)
      lo.remove(best + 1); hi.remove(best + 1); cnt.remove(best + 1)
    }
    new GenericArrayData(lo.indices.map(i =>
      new GenericInternalRow(Array[Any](lo(i), hi(i), cnt(i).toDouble)): Any).toArray)
  }

  override def serialize(buf: java.util.HashMap[Integer, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Integer, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.put(in.readInt(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(child = l, nExpr = r)
}
