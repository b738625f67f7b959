package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-only language scoring for [[graft.operators.LangId]]: ONE pass
  * over a document's character n-grams against the broadcast-sized
  * profile model, returning the per-language integer micro-nat NLL
  * array (language order = the model's sorted `langs`).
  *
  * This replaces the explode→join→re-aggregate plan shape, which
  * shuffled (grams x matching languages) rows — ~25M for 5k docs at
  * sf0.1 and unbounded at corpus scale. Here the only per-doc cost is
  * the gram loop itself and NOTHING shuffles: the model rides the
  * expression (bounded at #langs x topK entries), scoring is a
  * projection, and the downstream argmin is array arithmetic.
  *
  * Gram semantics are IDENTICAL to LangId.grams (lowercase, n-length
  * code-point windows): offsets walk Unicode code points, matching
  * Spark's substring, so profiles trained via the SQL path score
  * byte-identically here.
  */
case class LangScore(
    child: Expression,
    model: LangScoreModel) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_score"

  protected override def nullSafeEval(v: Any): Any =
    new GenericArrayData(model.score(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("langScoreModel", model,
      classOf[LangScoreModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData($m.score($c))")
  }

  override protected def withNewChildInternal(c: Expression): LangScore =
    copy(child = c)
}

/** langs sorted; grams maps gram -> per-language lpm (Long.MinValue =
  * absent from that language's profile -> flat penalty).
  */
final case class LangScoreModel(
    langs: Array[String],
    grams: java.util.HashMap[String, Array[Long]],
    n: Int,
    penaltyMicro: Long) extends Serializable {

  def score(text: UTF8String): Array[Long] = {
    val s = text.toLowerCase.toString
    val nl = langs.length
    val out = new Array[Long](nl)
    // code-point offsets once: grams are code-point windows (Spark
    // substring semantics), not UTF-16 char windows
    val cps = new Array[Int](s.codePointCount(0, s.length) + 1)
    var off = 0
    var k = 0
    while (off < s.length) { cps(k) = off; k += 1; off += Character.charCount(s.codePointAt(off)) }
    cps(k) = s.length
    val total = k // code points
    if (total < n) return out
    var i = 0
    while (i + n <= total) {
      val arr = grams.get(s.substring(cps(i), cps(i + n)))
      var l = 0
      if (arr == null) {
        while (l < nl) { out(l) += penaltyMicro; l += 1 }
      } else {
        while (l < nl) {
          out(l) += (if (arr(l) == Long.MinValue) penaltyMicro else arr(l))
          l += 1
        }
      }
      i += 1
    }
    out
  }
}
