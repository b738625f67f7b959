package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, GraphAnn, IvfGraph, SelfQueryFilter => F}

/** Gates for SELECTIVITY-DISPATCHED filtered ANN (r7/r8 verdict item:
  * "an engine chooses") — [[GraphAnn!.topKBatchAuto]] /
  * [[IvfGraph!.topKBatchAuto]].
  *
  * Contracts:
  *   1. The one-block selectivity estimate is accurate on both a ~0.5%
  *      and a ~50% predicate (blocks are an unbiased sample).
  *   2. The dispatcher picks BRUTE below the crossover and BEAM above
  *      it, and at full ef both paths return bit-identical results
  *      (same kernel, same (dist, id) ties — the exactness contract
  *      that lets q149/q150 share q121's oracle recipe).
  *   3. The brute path's cost scales with SURVIVORS, not corpus size
  *      (measured visited counts), which is the entire reason the
  *      dispatch exists: the filtered beam degrades toward full
  *      traversal exactly where brute cost approaches zero.
  *   4. Tombstones gate both paths identically.
  */
class AnnDispatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 8000L
  private val C = 40
  // lbl = vec_id % 200: Eq picks 0.5% of rows, Lte(99) picks 50% —
  // both independent of cluster structure, so survivor sets span blocks
  private lazy val corpus = {
    val df = ClusteredCorpus.df(spark, N, C)
      .withColumn("lbl", (col("vec_id") % 200).cast("long"))
      .repartition(2).cache()
    df.count()
    df
  }
  private lazy val g =
    GraphAnn.build(corpus, "vec_id", "embedding", metaCols = Seq("lbl"))

  private val rare: Option[F.Node] = Some(F.Eq("lbl", F.I(7L)))
  private val broad: Option[F.Node] = Some(F.Lte("lbl", F.I(99L)))

  test("one-block selectivity estimate is accurate at both extremes") {
    val sRare = g.estimateSelectivity(rare.get)
    val sBroad = g.estimateSelectivity(broad.get)
    info(f"estimated selectivity: rare $sRare%.4f (true 0.005), " +
      f"broad $sBroad%.3f (true 0.500)")
    assert(sRare > 0.0 && sRare < 0.02, s"rare estimate $sRare off")
    assert(sBroad > 0.35 && sBroad < 0.65, s"broad estimate $sBroad off")
  }

  test("dispatcher picks brute at ~0.5% and beam at ~50%; full-ef results identical") {
    val q = ClusteredCorpus.query(1)
    val (rRare, _, bruteRare) = g.topKAuto(q, 10, ef = N.toInt, filter = rare)
    assert(bruteRare, "0.5% selectivity must dispatch to brute force")
    val (beamRare, _) = g.topK(q, 10, ef = N.toInt, filter = rare)
    assert(rRare.sameElements(beamRare),
      "brute and full-ef beam must agree bit-identically on the rare filter")

    val (rBroad, _, bruteBroad) = g.topKAuto(q, 10, ef = N.toInt, filter = broad)
    assert(!bruteBroad, "50% selectivity must dispatch to the beam")
    val (bfBroad, _) = g.topKBatchBrute(Array(q), 10, broad)
    assert(rBroad.sameElements(bfBroad.head),
      "full-ef beam and brute must agree bit-identically on the broad filter")

    // unfiltered: always the structure's native path
    val (_, _, bruteNone) = g.topKAuto(q, 10, ef = 64, filter = None)
    assert(!bruteNone)
  }

  test("crossover is a parameter: forced-brute and forced-beam agree at full ef") {
    val q = ClusteredCorpus.query(2)
    val (forcedBrute, _, b1) =
      g.topKAuto(q, 10, ef = N.toInt, filter = broad, bruteBelow = 1.1)
    val (forcedBeam, _, b2) =
      g.topKAuto(q, 10, ef = N.toInt, filter = broad, bruteBelow = 0.0)
    assert(b1 && !b2)
    assert(forcedBrute.sameElements(forcedBeam))
  }

  test("brute cost is survivors, not corpus: visited counts scale with selectivity") {
    val q = ClusteredCorpus.query(3)
    val (resRare, visitedRare) = g.topKBatchBrute(Array(q), 10, rare)
    val (_, visitedBroad) = g.topKBatchBrute(Array(q), 10, broad)
    assert(resRare.head.nonEmpty)
    info(s"brute distances computed: rare $visitedRare, broad $visitedBroad of $N")
    assert(visitedRare <= (N * 0.01).toLong,
      s"rare brute computed $visitedRare distances, expected ~0.5% of $N")
    assert(visitedBroad >= (N * 0.4).toLong && visitedBroad <= (N * 0.6).toLong)
    // beam on the same rare filter degrades toward full traversal — the
    // measured premise of the dispatch (not a bit-contract, so bounded
    // loosely: it must visit far more than the survivor count)
    val (_, beamVisited) = g.topK(q, 10, ef = 64, filter = rare)
    assert(beamVisited > visitedRare * 5,
      s"filtered beam visited $beamVisited vs brute's $visitedRare survivors")
  }

  test("tombstones gate the brute path (fresh instance, both paths agree)") {
    val g2 = GraphAnn.build(corpus, "vec_id", "embedding", metaCols = Seq("lbl"))
    try {
      val q = ClusteredCorpus.query(4)
      val (before, _) = g2.topKBatchBrute(Array(q), 10, rare)
      val dead = before.head.take(3).map(_._1)
      g2.delete(dead)
      val (after, _, usedBrute) = g2.topKAuto(q, 10, ef = N.toInt, filter = rare)
      assert(usedBrute)
      assert(after.map(_._1).toSet.intersect(dead.toSet).isEmpty)
      val (beamAfter, _) = g2.topK(q, 10, ef = N.toInt, filter = rare)
      assert(after.sameElements(beamAfter))
    } finally g2.unpersist()
  }

  // ---- IvfGraph (routed) mirror ----------------------------------------

  test("IvfGraph dispatcher: brute at ~0.5% (all clusters), beam at ~50%; exact parity") {
    val (model, indexed) = AnnIndex.fit(corpus, "embedding", "vec_id", k = C, iters = 3)
    val withMeta = indexed.select(col("cluster_id"), col("vec_id"),
      col("embedding"), col("lbl"))
    val ig = IvfGraph.build(withMeta, model, "vec_id", "embedding",
      metaCols = Seq("lbl"))
    try {
      val sRare = ig.estimateSelectivity(rare.get)
      val sBroad = ig.estimateSelectivity(broad.get)
      info(f"IvfGraph estimates: rare $sRare%.4f, broad $sBroad%.3f")
      assert(sRare < 0.02 && sBroad > 0.35 && sBroad < 0.65)

      val q = ClusteredCorpus.query(5)
      val (rRare, _, bruteRare) =
        ig.topKAuto(q, 10, nprobe = C, ef = N.toInt, filter = rare)
      assert(bruteRare)
      val (beamRare, _) = ig.topK(q, 10, nprobe = C, ef = N.toInt, filter = rare)
      assert(rRare.sameElements(beamRare),
        "brute over all clusters must equal the full-probe full-ef beam")

      val (rBroad, _, bruteBroad) =
        ig.topKAuto(q, 10, nprobe = C, ef = N.toInt, filter = broad)
      assert(!bruteBroad)
      val (bfBroad, _) = ig.topKBatchBrute(Array(q), 10, broad)
      assert(rBroad.sameElements(bfBroad.head))
    } finally ig.unpersist()
  }
}
