package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `chain_count(events, nStages)` — the per-user kernel of ClickHouse
  * `sequenceCount('(?1).*(?2)…')(ts, cond1, …)` (the reference engine's
  * behavioral-analytics family; ClickHouse "Parametric aggregate
  * functions"). Input is ONE user's matched events as a ts-sorted array of
  * struct(ts: long epoch-micros, stage: int 1-based); output is the number
  * of NON-OVERLAPPING completed chains stage 1 → … → L matched greedily
  * left-to-right (ClickHouse's "search restarts after each match").
  *
  * Contract (mirrored by the DuckDB oracle, q156): chain events must have
  * STRICTLY increasing timestamps; greedy progress p advances when an
  * event carries stage p+1, completing a chain resets p to 0; events that
  * do not advance the chain are skipped (the `.*` gaps). Equal-timestamp
  * groups advance the chain AT MOST once (no two chain elements may share
  * a ts) and a completed chain does not restart within its completing
  * group. For L = 2 and distinct timestamps this equals the closed form
  * "collapse consecutive duplicate stages, count adjacent 1→2 pairs",
  * which is what the SQL oracle computes.
  */
case class ChainCount(events: Expression, nStages: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = events
  override def right: Expression = nStages
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chain_count"

  override def checkInputDataTypes(): TypeCheckResult = events.dataType match {
    case ArrayType(StructType(Array(f1, f2)), _)
        if f1.dataType == LongType && f2.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"chain_count expects array<struct<ts: long, stage: int>>, got $t")
  }

  override def nullSafeEval(ev: Any, ns: Any): Any = {
    val arr = ev.asInstanceOf[ArrayData]
    val stages = ns.asInstanceOf[Int]
    val n = arr.numElements()
    if (n == 0 || stages <= 0) return 0
    val (tsA, stA) = FunnelLevel.unpack(arr, n)
    FunnelDp.chainCount(tsA, stA, n, stages)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(events = l, nStages = r)
}
