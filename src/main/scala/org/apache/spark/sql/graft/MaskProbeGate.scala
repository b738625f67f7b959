package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The grouped deletion-mask row gate as a codegen Predicate: a row is
  * LIVE unless the broadcast Map[file -> sorted positions] marks its
  * (file, row position) deleted.
  *
  * Replaces the Scala UDF gate (r14 verdict watch item, promoted by
  * WideProbeSoak's measurement: on a NARROW aggregate — 8 data bytes
  * per row, column pruning leaves the probe as the only per-row JVM
  * work — the UDF gate read at 1.76x the clean floor; wide/sha shapes
  * hid it at 1.1-1.2x). Two properties buy the gap back:
  *
  *   - rows stream out of a parquet scan FILE BY FILE, so the gate
  *     memoizes the last file's position array: the UTF8String ->
  *     String conversion and the map lookup happen once per FILE, not
  *     once per row — the per-row work drops to one UTF8String
  *     equality (cheap byte compare, almost always a pointer-length
  *     match) + one binary search;
  *   - `doGenCode` keeps the filter inside the WholeStageCodegen span
  *     (the UDF forced an invoke + conversion boundary per row).
  *
  * The memo lives in CODEGEN mutable state — per generated-class
  * instance, i.e. per task — so there is no cross-thread sharing. The
  * interpreted `eval` path deliberately does NOT memoize: interpreted
  * Predicate instances can be shared, and a stale-memo wrong read is
  * never worth a fallback path's speed.
  *
  * Null inputs read as LIVE (a row with no identity cannot be masked);
  * `_metadata` columns are non-null in practice.
  */
case class MaskProbeGate(left: Expression, right: Expression,
    bc: Broadcast[Map[String, Array[Long]]])
  extends BinaryExpression with Predicate {

  override def nullable: Boolean = false
  override def prettyName: String = "mask_probe_live"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val f = left.eval(input)
    val p = right.eval(input)
    if (f == null || p == null) true
    else MaskProbeGate.liveSlow(bc, f.asInstanceOf[UTF8String],
      p.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val fileEv = left.genCode(ctx)
    val posEv = right.genCode(ctx)
    val bcRef = ctx.addReferenceObj("maskBc", bc,
      classOf[Broadcast[Map[String, Array[Long]]]].getName)
    val lastFile = ctx.addMutableState("UTF8String", "probeLastFile")
    val lastArr = ctx.addMutableState("long[]", "probeLastArr")
    val seen = ctx.addMutableState("boolean", "probeSeen")
    ev.copy(
      code = code"""
        ${fileEv.code}
        ${posEv.code}
        boolean ${ev.value} = true;
        if (!${fileEv.isNull} && !${posEv.isNull}) {
          if (!$seen || !$lastFile.equals(${fileEv.value})) {
            $lastFile = ${fileEv.value}.clone();
            $lastArr = org.apache.spark.sql.graft.MaskProbeGate.lookup(
              $bcRef, ${fileEv.value});
            $seen = true;
          }
          ${ev.value} = $lastArr == null ||
            java.util.Arrays.binarySearch($lastArr, ${posEv.value}) < 0;
        }
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MaskProbeGate {
  /** Per-FILE lookup from codegen (file-change path only). */
  def lookup(bc: Broadcast[Map[String, Array[Long]]],
      f: UTF8String): Array[Long] =
    bc.value.getOrElse(f.toString, null)

  /** Memo-free per-row gate for the interpreted path. */
  def liveSlow(bc: Broadcast[Map[String, Array[Long]]],
      f: UTF8String, p: Long): Boolean = {
    val a = bc.value.getOrElse(f.toString, null)
    a == null || java.util.Arrays.binarySearch(a, p) < 0
  }
}
