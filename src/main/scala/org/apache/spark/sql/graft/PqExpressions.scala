package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization expressions (see [[graft.operators.PqIndex]] for
  * the method + training; codebooks arrive flattened [m*k*dsub]).
  */

/** `pq_encode(vec)` -> binary of `m` bytes: per subspace, the index of the
  * nearest codebook centroid (L2).
  */
case class PqEncode(child: Expression, flat: Array[Float], m: Int, k: Int, dsub: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  protected override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toFloatArray
    val out = new Array[Byte](m)
    var mm = 0
    while (mm < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (mm * k + c) * dsub
        var acc = 0.0; var j = 0
        while (j < dsub) {
          // vectors shorter than m*dsub are zero-padded, not a crash
          val xi = mm * dsub + j
          val xv = if (xi < x.length) x(xi).toDouble else 0.0
          val t = xv - flat(off + j).toDouble
          acc += t * t; j += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(mm) = best.toByte
      mm += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = ctx.addReferenceObj("pqCodebooks", flat, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val xa = ctx.freshName("xa"); val out = ctx.freshName("out")
      val mm = ctx.freshName("mm"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off"); val t = ctx.freshName("t")
      s"""
         |final float[] $xa = $x.toFloatArray();
         |final byte[] $out = new byte[$m];
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    final int $off = ($mm * $k + $c) * $dsub;
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      final int ${j}x = $mm * $dsub + $j;
         |      final double $t = (${j}x < $xa.length ? (double) $xa[${j}x] : 0.0) - (double) $fl[$off + $j];
         |      $acc += $t * $t;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |  }
         |  $out[$mm] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `pq_adc_distance(code)` -> approximate squared-L2 distance from the
  * (constructor-fixed) query to the encoded vector: Σ_m lut[m][code[m]],
  * where the per-query lookup table is precomputed once — the scan does M
  * table lookups and adds per row, nothing else.
  */
case class PqAdcDistance(child: Expression, flat: Array[Float], m: Int, k: Int,
    dsub: Int, query: Array[Float])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_distance"

  /** lut(mm*k + c) = ||q_mm - centroid_c||^2 in subspace mm. */
  @transient private lazy val lut: Array[Double] = {
    val out = new Array[Double](m * k)
    var mm = 0
    while (mm < m) {
      var c = 0
      while (c < k) {
        val off = (mm * k + c) * dsub
        var acc = 0.0; var j = 0
        while (j < dsub) {
          val t = query(mm * dsub + j).toDouble - flat(off + j).toDouble
          acc += t * t; j += 1
        }
        out(mm * k + c) = acc
        c += 1
      }
      mm += 1
    }
    out
  }

  protected override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var mm = 0
    val n = math.min(code.length, m)
    while (mm < n) { acc += lut(mm * k + (code(mm) & 0xff)); mm += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val mm = ctx.freshName("mm"); val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($x.length, $m);
         |double $acc = 0.0;
         |for (int $mm = 0; $mm < $n; $mm++) {
         |  $acc += $lutRef[$mm * $k + ($x[$mm] & 0xff)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
