package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `funnel_level(events, windowMicros, nStages)` — the per-user kernel of
  * ClickHouse/MyScale `windowFunnel` (the reference engine's behavioral-
  * analytics aggregate; ClickHouse docs "Parametric aggregate functions").
  * Input is ONE user's matched events as a ts-sorted array of
  * struct(ts: long epoch-micros, stage: int 1-based); output is the max L
  * such that there exist events e1, …, eL with stage(ei) = i, STRICTLY
  * increasing timestamps, and ts(eL) − ts(e1) ≤ windowMicros.
  *
  * Algorithm (one linear pass, O(n·L) worst case): `start(s)` holds the
  * LATEST chain-start timestamp among chains that have reached stage s
  * using only events strictly before the current timestamp group. Taking
  * the max start is optimal: a later chain start can only widen the
  * remaining window, and feasibility (ts − start ≤ window) is monotone in
  * start. Events sharing a timestamp update from the PRE-group state, so
  * "strictly increasing" never matches two equal-ts events into one chain
  * (the two-phase update below).
  *
  * `mode` (bitmask; default 0 is the oracle-gated semantics above, which
  * equals ClickHouse's 'strict_increase' — the deterministic choice,
  * since ClickHouse's own default leaves equal-ts chaining order-defined
  * by insertion):
  *
  *   - [[FunnelLevel.StrictOrder]] ('strict_order'): the ClickHouse
  *     single-chain search — a non-matching event (stage 0; the caller
  *     ships them) arriving after the first stage-1, or a stage-s event
  *     whose predecessor slot is empty, TERMINATES the search at the
  *     level reached ("A→B→D→C stops finding A→B→C at D"). Events that
  *     match SOME stage in order do not interrupt; stage-1 events restart
  *     the chain start (and keep higher slots, as ClickHouse does).
  *   - [[FunnelLevel.StrictDedup]] ('strict_dedup'): a stage-s event
  *     (s ≥ 2) whose own slot is already filled terminates the search and
  *     — mirroring ClickHouse exactly — returns s, which can be LOWER
  *     than the level already reached (e.g. stages 1..4 on A,B,C,B
  *     returns 2 though A→B→C reached 3); stage-1 repeats never
  *     dedup-terminate, they restart.
  *
  *   Strict modes process events in array order — (ts, stage) ascending,
  *   deterministic under sort_array — with the strict-increase time check
  *   kept, instead of the default path's two-phase group update.
  */
case class FunnelLevel(events: Expression, windowMicros: Expression,
    nStages: Expression, mode: Int = 0)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = events
  override def second: Expression = windowMicros
  override def third: Expression = nStages
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "funnel_level"

  private val strictOrder = (mode & FunnelLevel.StrictOrder) != 0
  private val strictDedup = (mode & FunnelLevel.StrictDedup) != 0

  override def checkInputDataTypes(): TypeCheckResult = events.dataType match {
    case ArrayType(StructType(Array(f1, f2)), _)
        if f1.dataType == LongType && f2.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"funnel_level expects array<struct<ts: long, stage: int>>, got $t")
  }

  override def nullSafeEval(ev: Any, win: Any, ns: Any): Any = {
    val arr = ev.asInstanceOf[ArrayData]
    val window = win.asInstanceOf[Long]
    val stages = ns.asInstanceOf[Int]
    val n = arr.numElements()
    if (n == 0 || stages <= 0) return 0
    val (tsA, stA) = FunnelLevel.unpack(arr, n)
    if (strictOrder || strictDedup)
      FunnelDp.strictLevel(tsA, stA, n, window, stages, strictOrder, strictDedup)
    else FunnelDp.level(tsA, stA, n, window, stages)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(events = f, windowMicros = s, nStages = t)
}

object FunnelLevel {
  val StrictOrder = 1
  val StrictDedup = 2

  /** ArrayData of struct(ts, stage) → parallel primitive arrays (the
    * [[FunnelDp]] kernel input shape).
    */
  private[graft] def unpack(arr: ArrayData, n: Int): (Array[Long], Array[Int]) = {
    val ts = new Array[Long](n)
    val st = new Array[Int](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ts(i) = row.getLong(0)
      st(i) = row.getInt(1)
      i += 1
    }
    (ts, st)
  }
}
