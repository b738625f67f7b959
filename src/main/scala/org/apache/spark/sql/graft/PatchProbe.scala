package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One file's outstanding patch rows: positions sorted ascending, with
  * the batch's collected rows aligned index-for-index. Values live as
  * INTERNAL rows (UTF8String/Decimal/ArrayData), so the probe returns
  * them to codegen without conversion.
  */
final class PatchFileHits(val pos: Array[Long], val rows: Array[InternalRow])
  extends Serializable

/** The patch-batch apply as a codegen expression — the patch-side
  * sibling of [[MaskProbeGate]] (r17 verdict "next round" item 2).
  *
  * [[graft.operators.Catalog.applyPatches]]'s join shape costs every
  * read of a patched table a BroadcastExchange per outstanding batch:
  * under AQE that is a separate stage-materialization job (plus its
  * driver gap) per batch per action, and the join/project machinery
  * sits between the scan and the aggregate. For a batch within the
  * broadcast policy the values fit on the driver by the same argument
  * that lets the join broadcast its build side — so this expression
  * carries them as a broadcast Map[file -> sorted (pos, row)] and
  * rewrites each patched column in place:
  *
  *   patched(c) = hit && set_c ? batch value (possibly NULL) : orig(c)
  *
  * which is bit-for-bit the join path's
  * `when(__patch_hit [&& __set_c], __patch_c).otherwise(c)` on a
  * LEFT-joined (file, pos) — [[graft.MaskSpec]] pins the equivalence.
  * Same two properties as the mask gate: the per-FILE lookup memoizes
  * in codegen mutable state (rows stream out of parquet file by file),
  * and `doGenCode` keeps the whole apply inside the WholeStageCodegen
  * span. The interpreted path deliberately does not memoize.
  *
  * `setOrdinal` < 0 means a single-statement batch (every row assigns
  * every batch column by construction); >= 0 is the folded-batch
  * per-column presence flag ([[graft.operators.Catalog.SetPrefix]]).
  * Null (file, pos) inputs fall through to the original value, exactly
  * like a join miss.
  */
case class PatchProbeValue(
    file: Expression, pos: Expression, orig: Expression,
    ordinal: Int, setOrdinal: Int,
    bc: Broadcast[Map[String, PatchFileHits]])
  extends TernaryExpression {

  override def first: Expression = file
  override def second: Expression = pos
  override def third: Expression = orig

  override def dataType: DataType = orig.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "patch_probe_value"

  override def eval(input: InternalRow): Any = {
    val f = file.eval(input)
    val p = pos.eval(input)
    if (f != null && p != null) {
      val hits = PatchProbe.lookup(bc, f.asInstanceOf[UTF8String])
      if (hits != null) {
        val i = java.util.Arrays.binarySearch(hits.pos, p.asInstanceOf[Long])
        if (i >= 0) {
          val row = hits.rows(i)
          if (setOrdinal < 0 || row.getBoolean(setOrdinal))
            return if (row.isNullAt(ordinal)) null
              else row.get(ordinal, dataType)
        }
      }
    }
    orig.eval(input)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val fileEv = file.genCode(ctx)
    val posEv = pos.genCode(ctx)
    val origEv = orig.genCode(ctx)
    val hitsCls = classOf[PatchFileHits].getName
    val bcRef = ctx.addReferenceObj("patchBc", bc,
      classOf[Broadcast[Map[String, PatchFileHits]]].getName)
    val lastFile = ctx.addMutableState("UTF8String", "patchLastFile")
    val lastHits = ctx.addMutableState(hitsCls, "patchLastHits")
    val seen = ctx.addMutableState("boolean", "patchSeen")
    val idx = ctx.freshName("patchIdx")
    val applied = ctx.freshName("patchApplied")
    val rowVar = ctx.freshName("patchRow")
    val javaType = CodeGenerator.javaType(dataType)
    val getVal = CodeGenerator.getValue(rowVar, dataType, ordinal.toString)
    val setGate =
      if (setOrdinal >= 0) s"$rowVar.getBoolean($setOrdinal)" else "true"
    ev.copy(code = code"""
        ${fileEv.code}
        ${posEv.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        int $idx = -1;
        if (!${fileEv.isNull} && !${posEv.isNull}) {
          if (!$seen || !$lastFile.equals(${fileEv.value})) {
            $lastFile = ${fileEv.value}.clone();
            $lastHits = ($hitsCls) org.apache.spark.sql.graft.PatchProbe
              .lookup($bcRef, ${fileEv.value});
            $seen = true;
          }
          if ($lastHits != null) {
            $idx = java.util.Arrays.binarySearch(
              $lastHits.pos(), ${posEv.value});
          }
        }
        boolean $applied = false;
        if ($idx >= 0) {
          org.apache.spark.sql.catalyst.InternalRow $rowVar =
            $lastHits.rows()[$idx];
          if ($setGate) {
            $applied = true;
            if (!$rowVar.isNullAt($ordinal)) {
              ${ev.isNull} = false;
              ${ev.value} = $getVal;
            }
          }
        }
        if (!$applied) {
          ${origEv.code}
          ${ev.isNull} = ${origEv.isNull};
          if (!${ev.isNull}) {
            ${ev.value} = ${origEv.value};
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(file = newFirst, pos = newSecond, orig = newThird)
}

object PatchProbe {
  /** Per-FILE lookup from codegen (file-change path only). */
  def lookup(bc: Broadcast[Map[String, PatchFileHits]],
      f: UTF8String): PatchFileHits =
    bc.value.getOrElse(f.toString, null)
}
