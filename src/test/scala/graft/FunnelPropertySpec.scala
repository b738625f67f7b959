package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.graft.{FunnelDp, SequencePattern}

/** Property armor for the behavioral DP kernels: each kernel is checked
  * against an INDEPENDENT brute-force reference (exhaustive subsequence
  * search / index-tuple enumeration — different algorithm, different
  * failure modes) over seeded random event streams with duplicate
  * timestamps. The brute references encode the documented contracts
  * verbatim; the kernels are linear/DP reformulations whose equivalence
  * is exactly what these properties pin. (Strict funnel modes are
  * scan-definitional — their unit tests in FunnelSpec are the contract.)
  */
class FunnelPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** (ts, stage) stream sorted by (ts, stage) — duplicate ts included
    * when `dupTs` (small ts domain), distinct otherwise.
    */
  private def streamGen(maxStage: Int, dupTs: Boolean): Gen[Array[(Long, Int)]] =
    for {
      n <- Gen.chooseNum(0, 10)
      ts <- if (dupTs) Gen.listOfN(n, Gen.chooseNum(0L, 6L).map(_ * 1000L))
            else Gen.pick(n, (0L until 40L).map(_ * 1000L)).map(_.toList)
      st <- Gen.listOfN(n, Gen.chooseNum(0, maxStage))
    } yield ts.zip(st).sortBy(identity).toArray

  /** Brute windowFunnel: max L' with indices i1<…<iL', stage(ij)=j,
    * STRICTLY increasing ts, ts(last)−ts(first) ≤ window. Exhaustive
    * DFS over index tuples.
    */
  private def bruteLevel(ev: Array[(Long, Int)], window: Long,
      stages: Int): Int = {
    def extend(from: Int, nextStage: Int, startTs: Long, lastTs: Long): Int = {
      var best = nextStage - 1
      if (nextStage > stages) return stages
      var i = from
      while (i < ev.length) {
        val (t, s) = ev(i)
        if (s == nextStage && t > lastTs && t - startTs <= window) {
          val r = extend(i + 1, nextStage + 1, startTs, t)
          if (r > best) best = r
        }
        i += 1
      }
      best
    }
    var best = 0
    for (i <- ev.indices if ev(i)._2 == 1) {
      val r = extend(i + 1, 2, ev(i)._1, ev(i)._1)
      if (r > best) best = r
    }
    best
  }

  /** Brute pattern match: enumerate index tuples; gap steps need
    * STRICTLY later ts, adjacency steps the NEXT index; check every
    * time constraint.
    */
  private def brutePattern(ev: Array[(Long, Int)],
      steps: Array[SequencePattern.Step]): Boolean = {
    def ok(d: Long, cs: List[(String, Long)]): Boolean = cs.forall {
      case ("<=", m) => d <= m
      case ("<", m)  => d < m
      case (">=", m) => d >= m
      case (">", m)  => d > m
      case ("==", m) => d == m
      case _         => false
    }
    def search(stepIdx: Int, prevIdx: Int): Boolean = {
      if (stepIdx == steps.length) return true
      val st = steps(stepIdx)
      val candidates =
        if (stepIdx == 0) ev.indices
        else if (st.gapBefore) (prevIdx + 1) until ev.length
        else Seq(prevIdx + 1).filter(_ < ev.length)
      candidates.exists { i =>
        ev(i)._2 == st.cond &&
          (stepIdx == 0 || {
            val d = ev(i)._1 - ev(prevIdx)._1
            (!st.gapBefore || d > 0) && ok(d, st.constraints)
          }) && search(stepIdx + 1, i)
      }
    }
    search(0, -1)
  }

  /** Brute greedy chain count on DISTINCT-ts streams: linear greedy
    * written as explicit list recursion (the kernel's two-phase group
    * machinery never engages without duplicate ts).
    */
  private def bruteChainCount(ev: List[(Long, Int)], stages: Int): Int = {
    @annotation.tailrec
    def go(rest: List[(Long, Int)], want: Int, done: Int): Int = rest match {
      case Nil => done
      case (_, s) :: tail =>
        if (s == want) {
          if (want == stages) go(tail, 1, done + 1)
          else go(tail, want + 1, done)
        } else go(tail, want, done)
    }
    go(ev, 1, 0)
  }

  test("windowFunnel default DP == exhaustive subsequence search (300 streams)") {
    var nontrivial = 0
    for (seed <- 1L to 300L) {
      val ev = sample(streamGen(maxStage = 3, dupTs = true), seed)
        .filter(_._2 >= 1)
      val window = Seq(1000L, 2500L, Long.MaxValue / 4)((seed % 3).toInt)
      val ts = ev.map(_._1); val st = ev.map(_._2)
      val got = FunnelDp.level(ts, st, ev.length, window, 3)
      val want = bruteLevel(ev, window, 3)
      assert(got === want, s"seed=$seed window=$window ev=${ev.toSeq}")
      if (want >= 2) nontrivial += 1
    }
    assert(nontrivial >= 25, s"generator too weak: $nontrivial nontrivial cases")
  }

  test("sequenceMatch pattern DP == exhaustive index-tuple search (300 streams x 6 patterns)") {
    val patterns = Seq("(?1).*(?2)", "(?1)(?2)", "(?1)(?t<=2)(?2)",
      "(?1).*(?t>1)(?2)", "(?1)(?2).*(?3)", "(?2).*(?1)(?3)")
      .map(SequencePattern.parse)
    var matchedSome = 0
    for (seed <- 1L to 300L) {
      val ev = sample(streamGen(maxStage = 3, dupTs = true), seed)
        .filter(_._2 >= 1)
      val ts = ev.map(_._1); val st = ev.map(_._2)
      patterns.foreach { steps =>
        val got = FunnelDp.patternMatch(ts, st, ev.length, steps)
        val want = brutePattern(ev, steps)
        assert(got === want,
          s"seed=$seed steps=${steps.toSeq} ev=${ev.toSeq}")
        if (want) matchedSome += 1
      }
    }
    assert(matchedSome > 100, s"generator too weak: $matchedSome matches")
  }

  test("sequenceCount kernel == explicit greedy recursion (300 distinct-ts streams)") {
    var nonzero = 0
    for (seed <- 1L to 300L) {
      val ev = sample(streamGen(maxStage = 2, dupTs = false), seed)
        .filter(_._2 >= 1)
      val ts = ev.map(_._1); val st = ev.map(_._2)
      val got = FunnelDp.chainCount(ts, st, ev.length, 2)
      val want = bruteChainCount(ev.toList, 2)
      assert(got === want, s"seed=$seed ev=${ev.toSeq}")
      if (want > 0) nonzero += 1
    }
    assert(nonzero > 30, s"generator too weak: $nonzero nonzero counts")
  }
}
