package graft.operators

import java.util.concurrent.ThreadLocalRandom

/** Bounded retry for optimistic-concurrency refusals — the caller-side
  * half of the commit protocols' contract ([[Manifest]] / [[EpochStore]]
  * class docs): a [[ConcurrentCommitException]] means NOTHING was
  * committed and nothing was lost; the correct response is re-read,
  * recompute, retry. Every [[Catalog]] mutation re-reads the table
  * state at entry ([[Catalog]]'s `beginMutation`) and a refused attempt
  * leaves nothing adopted (uncommitted fresh-named files are invisible
  * to manifest-served reads and swept by hygiene), so wrapping a whole
  * mutation is retry-safe by construction — the same reasoning as
  * Delta's `commitWithRetry` loop (a public design).
  *
  * Backoff is exponential with full jitter (decorrelates racers that
  * refused each other — two writers retrying in lockstep would collide
  * at every attempt), capped so the worst-case total wait stays
  * bounded and LOUD failure arrives promptly once contention is
  * persistent rather than transient.
  */
object Optimistic {

  /** Run `op`, retrying on [[ConcurrentCommitException]] up to
    * `attempts` times in total. Rethrows the last refusal when the
    * budget is exhausted — optimistic concurrency degrades loudly
    * under persistent contention, never silently. `op` MUST derive
    * everything it commits from state re-read inside the attempt
    * (true of every Catalog mutation; NOT true of a caller that
    * captured entries/DataFrames outside the closure).
    */
  def retryOnConflict[A](attempts: Int = 8, baseBackoffMs: Long = 5,
      maxBackoffMs: Long = 500)(op: => A): A = {
    require(attempts >= 1, "retryOnConflict: attempts must be >= 1")
    var attempt = 0
    while (true) {
      attempt += 1
      try return op
      catch {
        case e: ConcurrentCommitException =>
          if (attempt >= attempts) throw e
          val cap = math.min(maxBackoffMs,
            baseBackoffMs * (1L << math.min(attempt, 16)))
          Thread.sleep(ThreadLocalRandom.current().nextLong(cap + 1))
      }
    }
    sys.error("unreachable")
  }
}
