package org.apache.spark.sql.graft

/** The per-user behavioral-analytics kernels, shared between the
  * array-input expressions ([[FunnelLevel]], [[ChainCount]],
  * [[SequencePattern]] — the operator path, which pre-sorts via
  * sort_array) and the SQL aggregate functions ([[WindowFunnelAgg]]
  * family — which sort their packed buffers before calling in). All
  * kernels take parallel (ts micros, stage) arrays ALREADY sorted by
  * (ts, stage) ascending. Semantics documented on the expression
  * classes; this object only hosts the loops.
  */
object FunnelDp {

  /** windowFunnel default: multi-chain latest-start DP, two-phase
    * equal-ts groups, strictly increasing chains.
    */
  def level(ts: Array[Long], st: Array[Int], n: Int, window: Long,
      stages: Int): Int = {
    if (n == 0 || stages <= 0) return 0
    val start = Array.fill(stages + 1)(Long.MinValue)
    var best = 0
    var i = 0
    while (i < n && best < stages) {
      val t = ts(i)
      var j = i
      val pend = Array.fill(stages + 1)(Long.MinValue)
      while (j < n && ts(j) == t) {
        val s = st(j)
        if (s == 1) {
          if (t > pend(1)) pend(1) = t
        } else if (s >= 2 && s <= stages) {
          val prev = start(s - 1)
          if (prev != Long.MinValue && t - prev <= window && prev > pend(s))
            pend(s) = prev
        }
        j += 1
      }
      var s = 1
      while (s <= stages) {
        if (pend(s) > start(s)) {
          start(s) = pend(s)
          if (s > best) best = s
        }
        s += 1
      }
      i = j
    }
    best
  }

  /** windowFunnel strict_order / strict_dedup: the ClickHouse
    * single-chain search (see [[FunnelLevel]] scaladoc).
    */
  def strictLevel(ts: Array[Long], st: Array[Int], n: Int, window: Long,
      stages: Int, strictOrder: Boolean, strictDedup: Boolean): Int = {
    val NEG = Long.MinValue
    val start = Array.fill(stages + 1)(NEG)
    val last = Array.fill(stages + 1)(NEG)
    var firstEvent = false
    var best = 0
    var i = 0
    while (i < n) {
      val t = ts(i)
      val s = st(i)
      if (s <= 0) {
        if (strictOrder && firstEvent) return best
      } else if (s == 1) {
        start(1) = t; last(1) = t
        firstEvent = true
        if (best < 1) best = 1
      } else if (s <= stages) {
        if (strictDedup && start(s) != NEG) return s
        if (strictOrder && firstEvent && start(s - 1) == NEG) return best
        val prev = start(s - 1)
        if (prev != NEG && t - prev <= window && last(s - 1) < t) {
          start(s) = prev; last(s) = t
          if (s > best) best = s
          if (s == stages) return stages
        }
      }
      i += 1
    }
    best
  }

  /** sequenceCount chain form: greedy non-overlapping completed chains
    * (see [[ChainCount]] scaladoc).
    */
  def chainCount(ts: Array[Long], st: Array[Int], n: Int, stages: Int): Int = {
    if (n == 0 || stages <= 0) return 0
    var count = 0
    var p = 0
    var i = 0
    while (i < n) {
      val t = ts(i)
      var advanced = false
      var j = i
      while (j < n && ts(j) == t) {
        if (!advanced && st(j) == p + 1) {
          p += 1
          advanced = true
          if (p == stages) { count += 1; p = 0 }
        }
        j += 1
      }
      i = j
    }
    count
  }

  /** sequenceMatch full-pattern reachability DP (see [[SequencePattern]]
    * scaladoc).
    */
  def patternMatch(ts: Array[Long], st: Array[Int], n: Int,
      steps: Array[SequencePattern.Step]): Boolean = {
    val L = steps.length
    if (L == 0) return true
    if (n == 0) return false
    val reach = Array.ofDim[Boolean](n, L)
    val times = Array.fill(L)(new scala.collection.mutable.ArrayBuffer[Long]())
    var j = 0
    while (j < n) {
      val t = ts(j)
      val c = st(j)
      var s = 0
      while (s < L) {
        val step = steps(s)
        if (step.cond == c) {
          val ok =
            if (s == 0) true
            else if (step.gapBefore) {
              var lo = Long.MinValue
              var hi = t - 1
              step.constraints.foreach { case (op, micros) =>
                op match {
                  case "<=" => lo = math.max(lo, t - micros)
                  case "<"  => lo = math.max(lo, t - micros + 1)
                  case ">=" => hi = math.min(hi, t - micros)
                  case ">"  => hi = math.min(hi, t - micros - 1)
                  case "==" => lo = math.max(lo, t - micros); hi = math.min(hi, t - micros)
                }
              }
              lo <= hi && SequencePattern.anyInRange(times(s - 1), lo, hi)
            } else {
              j > 0 && reach(j - 1)(s - 1) && {
                val d = t - ts(j - 1)
                step.constraints.forall { case (op, micros) =>
                  op match {
                    case "<=" => d <= micros
                    case "<"  => d < micros
                    case ">=" => d >= micros
                    case ">"  => d > micros
                    case "==" => d == micros
                  }
                }
              }
            }
          if (ok) {
            if (s == L - 1) return true
            if (!reach(j)(s)) {
              reach(j)(s) = true
              times(s) += t
            }
          }
        }
        s += 1
      }
      j += 1
    }
    false
  }
}
