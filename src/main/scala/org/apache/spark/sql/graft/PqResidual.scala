package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** ADC distance for RESIDUAL product quantization (IVF-PQ proper, Jégou
  * et al. PAMI'11 §IV): codes quantize `v - centroid(cluster(v))`, so the
  * per-query lookup tables are built per CLUSTER from the residual query
  * `q - centroid_c`. dist²(q, v) ≈ Σ_m lut[cluster][m][code_m].
  *
  * Residual encoding needs no new expression — the residual column is
  * plain `zip_with(embedding, centroid, (a, b) -> a - b)` fed to
  * [[PqEncode]]; only the scan-side LUT selection is cluster-dependent.
  *
  * luts layout: [cluster][m][k] flattened; 16 clusters x 8 x 256 doubles
  * = 256 KB as a codegen reference object.
  */
case class PqAdcResidual(left: Expression, right: Expression,
    luts: Array[Double], m: Int, k: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_residual"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val cluster = b.asInstanceOf[Int]
    val base = cluster * m * k
    var acc = 0.0
    var mm = 0
    val n = math.min(code.length, m)
    while (mm < n) { acc += luts(base + mm * k + (code(mm) & 0xff)); mm += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqResLuts", luts, "double[]")
    nullSafeCodeGen(ctx, ev, (x, c) => {
      val mm = ctx.freshName("mm"); val acc = ctx.freshName("acc")
      val n = ctx.freshName("n"); val base = ctx.freshName("base")
      s"""
         |final int $n = java.lang.Math.min($x.length, $m);
         |final int $base = $c * $m * $k;
         |double $acc = 0.0;
         |for (int $mm = 0; $mm < $n; $mm++) {
         |  $acc += $lutRef[$base + $mm * $k + ($x[$mm] & 0xff)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
