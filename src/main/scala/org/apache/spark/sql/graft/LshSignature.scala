package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `lsh_signature(vec)`: 64 random-hyperplane sign bits packed into one
  * long — the signature stage of cosine-LSH near-dup (SURVEY §2 pipeline
  * extensions; Charikar STOC'02 applied to embedding vectors rather than
  * token sets, cf. [[SimHash64]] for the token variant).
  *
  * Why an expression rather than 64 `inner_product` columns: every
  * `inner_product(embedding, plane_i)` call bulk-copies the row's vector
  * out of ArrayData (~dim*4 bytes), so 64 of them copy 64x per row and
  * carry 64 codegen sub-loops. This computes the whole signature in ONE
  * pass: one copy, one fused loop over a flattened plane matrix held as a
  * codegen reference object.
  *
  * The hyperplanes derive deterministically from [[graft.functions
  * .HashEmbedder]] seeds, so signatures are stable across JVMs/sessions.
  */
case class LshSignature(child: Expression, planesFlat: Array[Float], dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(planesFlat.length == 64 * dim, "need 64 hyperplanes of `dim` floats")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_signature"

  protected override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toFloatArray
    val n = math.min(x.length, dim)
    var sig = 0L
    var p = 0
    while (p < 64) {
      val off = p * dim
      var dot = 0.0
      var j = 0
      while (j < n) { dot += x(j).toDouble * planesFlat(off + j).toDouble; j += 1 }
      if (dot > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planes = ctx.addReferenceObj("lshPlanes", planesFlat, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val xa = ctx.freshName("xa"); val n = ctx.freshName("n")
      val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
      val off = ctx.freshName("off"); val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      s"""
         |final float[] $xa = $x.toFloatArray();
         |final int $n = java.lang.Math.min($xa.length, $dim);
         |long $sig = 0L;
         |for (int $p = 0; $p < 64; $p++) {
         |  final int $off = $p * $dim;
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += (double) $xa[$j] * (double) $planes[$off + $j];
         |  }
         |  if ($dot > 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshSignature {
  /** Deterministic 64-plane matrix for `dim`-d vectors (seeded by the
    * hash-embedder, so stable everywhere).
    */
  def planes(dim: Int): Array[Float] = {
    val out = new Array[Float](64 * dim)
    var i = 0
    while (i < 64) {
      val h = graft.functions.HashEmbedder.embed(s"lsh-hyperplane-$i", dim)
      System.arraycopy(h, 0, out, i * dim, dim)
      i += 1
    }
    out
  }

  def lsh_signature(vec: Column, dim: Int): Column = {
    import Bridge.{toColumn, toExpr}
    toColumn(LshSignature(toExpr(vec), planes(dim), dim))
  }
}
