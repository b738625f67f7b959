package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `quantileExactWeighted(v, w, q)` — the exact weighted quantile: the
  * smallest v whose cumulative weight reaches q·Σw, i.e. the type-1
  * inverse CDF over v repeated w times (ClickHouse's repeat-semantics;
  * DuckDB's `quantile_disc` over unnested repeats is the oracle).
  * Buffer = value→weight map (O(distinct values)); eval walks the
  * SORTED values, so the pick is partitioning-exact. Zero/negative
  * weights contribute nothing.
  */
case class WeightedQuantileAgg(
    value: Expression,
    weight: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Double, java.lang.Long]]
  with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = weight
  override def prettyName: String = "quantile_exact_weighted"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!value.dataType.isInstanceOf[NumericType] ||
        !weight.dataType.isInstanceOf[IntegralType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (numeric value, integral weight)")
    else if (q < 0.0 || q > 1.0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName level must be in [0,1], got $q")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Double, java.lang.Long] =
    new java.util.HashMap()

  override def update(buf: java.util.HashMap[java.lang.Double, java.lang.Long],
      input: InternalRow): java.util.HashMap[java.lang.Double, java.lang.Long] = {
    val v = value.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wl = Num.toL(w)
      if (wl > 0) {
        val key = java.lang.Double.valueOf(Num.toD(v))
        val prev = buf.get(key)
        buf.put(key, if (prev == null) wl else prev + wl)
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[java.lang.Double, java.lang.Long],
      b2: java.util.HashMap[java.lang.Double, java.lang.Long]): java.util.HashMap[java.lang.Double, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[java.lang.Double, java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    if (buf.isEmpty) return null
    val sorted = buf.asScala.toSeq.sortBy(_._1.doubleValue())
    var total = 0L
    sorted.foreach(total += _._2.longValue())
    val threshold = q * total
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2.longValue()
      if (cum >= threshold) return sorted(i)._1.doubleValue()
      i += 1
    }
    sorted.last._1.doubleValue()
  }

  override def serialize(buf: java.util.HashMap[java.lang.Double, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.getKey.doubleValue()); out.writeLong(e.getValue.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Double, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.put(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): WeightedQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightedQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WeightedQuantileAgg =
    copy(value = l, weight = r)
}

/** `arrayAUC(scores, labels)` — ROC AUC of parallel score/label arrays
  * (ClickHouse's function of the same name): with average ranks for
  * tied scores, AUC = (Σ rank(positives) − P(P+1)/2) / (P·N). Returns
  * NaN when either class is empty (CH behavior). Per-row scalar loop
  * behind codegen.
  */
object ArrayAucOps {
  def auc(scores: ArrayData, labels: ArrayData): Double = {
    val n = scores.numElements()
    require(n == labels.numElements(),
      s"arrayAUC needs equal-length arrays, got $n/${labels.numElements()}")
    if (n == 0) return Double.NaN
    val sc = new Array[Double](n)
    val lb = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      sc(i) = scores.getDouble(i)
      lb(i) = labels.getInt(i) != 0
      i += 1
    }
    val idx = Array.range(0, n).sortBy(sc(_))
    var pos = 0L
    var rankSumPos = 0.0
    i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && sc(idx(j + 1)) == sc(idx(i))) j += 1
      val avgRank = (i + j + 2) / 2.0 // 1-based average rank of the tie run
      var k = i
      while (k <= j) {
        if (lb(idx(k))) { pos += 1; rankSumPos += avgRank }
        k += 1
      }
      i = j + 1
    }
    val neg = n - pos
    if (pos == 0L || neg == 0L) return Double.NaN
    (rankSumPos - pos * (pos + 1) / 2.0) / (pos.toDouble * neg)
  }
}

case class ArrayAuc(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_auc"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayAucOps.auc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ArrayAucOps.auc($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `corrMatrix(c1..cN)` / `covarSampMatrix` / `covarPopMatrix` — the
  * ClickHouse matrix aggregates. One buffer: n, per-column sums, and the
  * upper-triangle cross-product sums (O(N²) doubles, map-side combined —
  * the 20M-row fact table never moves). Returns array<array<double>>
  * (row-major N×N, symmetric).
  */
case class MomentMatrixAgg(
    cols: Seq[Expression],
    mode: String, // corr | covar_samp | covar_pop
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val nc = cols.length

  override def children: Seq[Expression] = cols
  override def prettyName: String = mode match {
    case "corr" => "corr_matrix"
    case "covar_samp" => "covar_samp_matrix"
    case _ => "covar_pop_matrix"
  }
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (nc < 2)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least 2 columns")
    else if (!cols.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs numeric columns")
    else if (!Set("corr", "covar_samp", "covar_pop").contains(mode))
      TypeCheckResult.TypeCheckFailure(s"unknown matrix mode '$mode'")
    else TypeCheckResult.TypeCheckSuccess

  // layout: [n, sum_0..sum_{nc-1}, cross_{i<=j} upper triangle]
  private val bufLen = 1 + nc + nc * (nc + 1) / 2

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val vals = new Array[Double](nc)
    var i = 0
    while (i < nc) {
      val v = cols(i).eval(input)
      if (v == null) return buf // rows with any null column are skipped
      vals(i) = Num.toD(v)
      i += 1
    }
    buf(0) += 1.0
    i = 0
    var t = 1 + nc
    while (i < nc) {
      buf(1 + i) += vals(i)
      var j = i
      while (j < nc) {
        buf(t) += vals(i) * vals(j)
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = buf(0)
    val out = Array.ofDim[Double](nc, nc)
    if (n >= 1) {
      def cross(i: Int, j: Int): Double = {
        val (a, b) = if (i <= j) (i, j) else (j, i)
        // offset of (a, b) in the packed upper triangle
        var off = 1 + nc
        var r = 0
        while (r < a) { off += nc - r; r += 1 }
        buf(off + (b - a))
      }
      var i = 0
      while (i < nc) {
        var j = 0
        while (j < nc) {
          val cij = cross(i, j) / n - (buf(1 + i) / n) * (buf(1 + j) / n)
          out(i)(j) = mode match {
            case "covar_pop" => cij
            case "covar_samp" => if (n > 1) cij * n / (n - 1) else Double.NaN
            case _ =>
              val cii = cross(i, i) / n - math.pow(buf(1 + i) / n, 2)
              val cjj = cross(j, j) / n - math.pow(buf(1 + j) / n, 2)
              if (cii <= 0.0 || cjj <= 0.0) { if (i == j) 1.0 else 0.0 }
              else cij / math.sqrt(cii * cjj)
          }
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.map(r => new GenericArrayData(r): Any))
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
    while (i < bufLen) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MomentMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MomentMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MomentMatrixAgg =
    copy(cols = newChildren)
}
