package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sequence_pattern(events, nStages)` — the full ClickHouse
  * `sequenceMatch('pattern')(ts, cond1, …)` pattern language over ONE
  * user's ts-sorted matched events (array of struct(ts: long micros,
  * stage: int 1-based); the q153 chain form is the `.*`-only special
  * case, which keeps its O(n·L) [[FunnelLevel]] kernel).
  *
  * Pattern syntax (ClickHouse "sequenceMatch"):
  *   - `(?N)`       — an event matching condition N (1-based)
  *   - `.*`         — any number of intervening events may occur
  *   - `(?t OP n)`  — time constraint between the SURROUNDING two steps:
  *                    `ts(next) − ts(prev) OP n` with OP ∈ <=, >=, <, >,
  *                    ==, and n in SECONDS (the ClickHouse DateTime unit;
  *                    converted to micros internally)
  *
  * Adjacency semantics (the ClickHouse contract): two step refs with no
  * `.*` between them must match ADJACENT events *among the events that
  * match some listed condition* — events matching no condition are
  * invisible, events matching any condition break adjacency. Gap (`.*`)
  * transitions require strictly increasing timestamps (the repo-wide
  * determinism contract, = the q153 chain form); adjacency transitions
  * allow equal timestamps in their deterministic (ts, stage) sort order.
  *
  * Algorithm: reachability DP over (event, step). Gap transitions query
  * "does any reachable ts at step s−1 fall in the feasible interval
  * [lo, hi]" (the constraint set compiles to one interval) by binary
  * search over the naturally-sorted reachable-ts list per step —
  * O(n log n · L) worst case, O(n·L) memory, per user.
  */
case class SequencePattern(events: Expression, nStages: Expression,
    pattern: String)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = events
  override def right: Expression = nStages
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sequence_pattern"

  private val steps: Array[SequencePattern.Step] =
    SequencePattern.parse(pattern)

  override def checkInputDataTypes(): TypeCheckResult = events.dataType match {
    case ArrayType(StructType(Array(f1, f2)), _)
        if f1.dataType == LongType && f2.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sequence_pattern expects array<struct<ts: long, stage: int>>, got $t")
  }

  override def nullSafeEval(ev: Any, ns: Any): Any = {
    val arr = ev.asInstanceOf[ArrayData]
    val stages = ns.asInstanceOf[Int]
    steps.foreach { st =>
      require(st.cond >= 1 && st.cond <= stages,
        s"pattern references (?${st.cond}) but only $stages conditions given")
    }
    val n = arr.numElements()
    val (tsA, stA) = FunnelLevel.unpack(arr, n)
    FunnelDp.patternMatch(tsA, stA, n, steps)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(events = l, nStages = r)
}

object SequencePattern {
  /** One `(?N)` step: its condition, whether `.*` precedes it, and the
    * time constraints against the previous step's matched event.
    */
  final case class Step(cond: Int, gapBefore: Boolean,
      constraints: List[(String, Long)])

  /** `[lo, hi]` range-existence over a sorted buffer via binary search. */
  def anyInRange(ts: scala.collection.mutable.ArrayBuffer[Long],
      lo: Long, hi: Long): Boolean = {
    var l = 0
    var r = ts.length
    while (l < r) { // first index with value >= lo
      val m = (l + r) >>> 1
      if (ts(m) >= lo) r = m else l = m + 1
    }
    l < ts.length && ts(l) <= hi
  }

  private val StepRe = """\(\?(\d+)\)""".r
  private val TimeRe = """\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\)""".r

  /** Compile a ClickHouse sequenceMatch pattern into steps. */
  def parse(pattern: String): Array[Step] = {
    var rest = pattern.trim
    val steps = scala.collection.mutable.ArrayBuffer.empty[Step]
    var gap = true // leading context is free: the match may start anywhere
    var pending = List.empty[(String, Long)]
    while (rest.nonEmpty) {
      if (rest.startsWith(".*")) {
        require(pending.isEmpty,
          s"sequenceMatch pattern '$pattern': (?t...) must sit directly between two step refs")
        gap = true
        rest = rest.drop(2)
      } else TimeRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          require(steps.nonEmpty,
            s"sequenceMatch pattern '$pattern': (?t...) cannot precede the first step")
          pending ::= (m.group(1), m.group(2).toLong * 1000000L)
          rest = rest.drop(m.matched.length)
        case None => StepRe.findPrefixMatchOf(rest) match {
          case Some(m) =>
            steps += Step(m.group(1).toInt,
              gapBefore = gap || steps.isEmpty, constraints = pending.reverse)
            gap = false
            pending = Nil
            rest = rest.drop(m.matched.length)
          case None => throw new IllegalArgumentException(
            s"sequenceMatch pattern '$pattern': cannot parse at '$rest'")
        }
      }
    }
    require(pending.isEmpty,
      s"sequenceMatch pattern '$pattern': trailing (?t...) has no following step")
    steps.toArray
  }
}
