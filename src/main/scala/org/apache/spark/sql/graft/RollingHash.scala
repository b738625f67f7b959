package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking via a polynomial rolling hash (Rabin-style,
  * the public CDC idea behind rsync/LBFS dedup): slide a `window`-byte
  * polynomial hash over the text; positions where `hash & mask == 0` are
  * chunk boundaries. Re-expressed for the dedup pipeline (SURVEY §2
  * pipeline extensions — "document fingerprinting"): CDC boundaries are
  * INSERT-STABLE (an edit only reshuffles chunks near the edit, unlike
  * fixed-size chunking), so chunk-hash sets survive partial edits and
  * feed the MinHash/Jaccard stages.
  *
  * `cdc_chunks(text)` returns the array of chunk LENGTHS (boundaries are
  * derivable as their prefix sums; lengths are what dedup stats consume).
  * Deterministic: polynomial base 257, 64-bit wraparound arithmetic.
  */
case class CdcChunks(child: Expression, window: Int, mask: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  protected override def nullSafeEval(v: Any): Any =
    new GenericArrayData(CdcChunks.split(v.asInstanceOf[UTF8String].getBytes, window, mask))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"org.apache.spark.sql.graft.CdcChunks.split($c.getBytes(), $window, ${mask}L))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CdcChunks {
  /** Chunk lengths for `bytes` under (window, mask). Boundary rule: after
    * byte i (i >= window-1), if the rolling hash of the last `window`
    * bytes has its low `mask` bits zero, cut. Final partial chunk always
    * emitted.
    */
  def split(bytes: Array[Byte], window: Int, mask: Long): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val B = 257L
    // B^(window-1) for the outgoing byte
    var bPow = 1L
    var i = 1
    while (i < window) { bPow *= B; i += 1 }
    var h = 0L
    var start = 0
    i = 0
    while (i < bytes.length) {
      val in = (bytes(i) & 0xff).toLong
      h = if (i < window) h * B + in
      else (h - (bytes(i - window) & 0xff).toLong * bPow) * B + in
      if (i >= window - 1 && (h & mask) == 0L) {
        out += (i - start + 1).toLong
        start = i + 1
      }
      i += 1
    }
    if (start < bytes.length) out += (bytes.length - start).toLong
    if (out.isEmpty) out += 0L
    out.toArray
  }

  def cdc_chunks(text: Column, window: Int = 16, mask: Long = 0x3f): Column = {
    import Bridge.{toColumn, toExpr}
    toColumn(CdcChunks(toExpr(text), window, mask))
  }
}
