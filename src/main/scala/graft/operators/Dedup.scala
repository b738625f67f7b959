package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn a near-duplicate PAIR set (the output
  * of any banded candidate generator — MinHash bands q45, SimHash bands q46,
  * blocked Jaccard q44) into connected components, so each document maps to
  * one canonical representative and a training pipeline can keep exactly one
  * doc per cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the min of its own label and
  * its neighbors' labels; converged when no label changes. Labels decrease
  * monotonically toward the component minimum, so convergence needs at most
  * `diameter` rounds and the result is independent of partitioning and join
  * order — byte-deterministic.
  *
  * Scale posture (100 TB): each round is one shuffle on node id (a groupBy
  * min) plus one equi-join — the same primitive the large-star/small-star
  * formulation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) optimizes to O(log n) rounds; near-dup graphs have
  * tiny diameters (duplicate chains), so plain propagation already
  * terminates in 2-4 rounds. Lineage is truncated every round with
  * localCheckpoint so the plan does not grow with iterations, and the
  * changed-label count that drives termination is the side effect of the
  * same action that materializes the round (no extra pass).
  */
object Dedup {

  /** Resolve components over an undirected pair set.
    *
    * @param pairs DataFrame with two long columns `i`, `j` (one row per
    *              undirected edge; orientation irrelevant)
    * @param nodes DataFrame with a long `id` column — the node universe
    *              (isolated docs keep themselves as canonical)
    * @return DataFrame(id, canonical) — canonical = min doc id reachable
    */
  def connectedComponents(pairs: DataFrame, nodes: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    val tE = System.nanoTime()
    val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
      .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
      .localCheckpoint(true)
    if (dbg) System.err.println(f"[cc] edges materialized ${(System.nanoTime()-tE)/1e9}%.3fs")

    val tl = System.nanoTime()
    var labels = nodes.select(col("id"), col("id").as("canonical"))
      .localCheckpoint(true)
    if (dbg) System.err.println(f"[cc] labels init ${(System.nanoTime()-tl)/1e9}%.3fs")

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val tr = System.nanoTime()
      // one round = min over {own label} ∪ {neighbors' labels}: the union
      // feeds a single hash aggregate on id (isolated nodes survive via
      // their self row), so a round is one broadcast-or-shuffle join plus
      // one groupBy — no left-join repair pass. min(canonical) under the
      // agg tracks the previous label so the convergence test rides the
      // same action that materializes the round.
      val next = edges
        .join(labels.select(col("id").as("src"), col("canonical").as("slbl")), "src")
        .select(col("dst").as("id"), col("slbl").as("lbl"), lit(null).cast("long").as("prev"))
        .unionByName(labels.select(col("id"), col("canonical").as("lbl"),
          col("canonical").as("prev")))
        .groupBy("id")
        // coalesce to MaxValue: an edge endpoint missing from `nodes` has
        // no self row, so min(prev) is NULL — without the coalesce it
        // would be EXCLUDED from the convergence test (NULL comparison)
        // while still appearing in the output, allowing premature
        // "convergence" with unstable labels. MaxValue counts it as
        // changed until it has a real previous-round label.
        .agg(min(col("lbl")).as("canonical"),
          coalesce(min(col("prev")), lit(Long.MaxValue)).as("prev"))
        .localCheckpoint(false)
      // ONE job per round: the UN-limited count computes every partition
      // of the lazily-checkpointed `next` (completing the checkpoint —
      // lineage truncates only after a full materialization; a limit(1)
      // would short-circuit and leave it partial) and its result IS the
      // convergence test. The old shape paid two jobs per round (eager
      // checkpoint count + separate convergence probe), and per-round job
      // overhead × diameter was most of q109's wall time.
      converged = next.filter(col("canonical") < col("prev")).count() == 0
      labels = next.drop("prev")
      round += 1
      if (dbg) System.err.println(f"[cc] round $round ${(System.nanoTime()-tr)/1e9}%.3fs converged=$converged")
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }
}
