package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, PqIndex, VectorStore}

/** The ANN/PQ OPERATING-POINT gates (round-2 verdict items 1 and 2).
  *
  * BASELINE.md's ANN budget — recall@10 ≥ 0.95 at ≥ 10× scan reduction —
  * is stated for clustered data (real embedding corpora). The driver's
  * uniform-random `embeddings` table is the degenerate worst case where
  * recall cannot exceed the probed fraction, so these gates run on the
  * deterministic planted-cluster corpus ([[ClusteredCorpus]]) and assert
  * the operating point by MEASURED rows, not nominal partition counts:
  * scan fraction = rows inside probed clusters / corpus rows.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 4000L
  private val C = 40
  private lazy val corpus = {
    val df = ClusteredCorpus.df(spark, N, C).cache()
    df.count()
    df
  }

  private def exactTop10(q: Array[Float]): Set[Long] =
    VectorStore(corpus, "embedding", Seq("vec_id"))
      .searchByVector(q, 10).select("vec_id").collect().map(_.getLong(0)).toSet

  test("IVF on clustered data: recall@10 >= 0.95 at >= 10x scan reduction") {
    val (model, indexed) =
      AnnIndex.fit(corpus, "embedding", "vec_id", k = C, iters = 5)
    val probes = (0 until 5).map(ClusteredCorpus.query(_))
    val nprobe = 3
    val results = probes.map { q =>
      val exact = exactTop10(q)
      val probed = model.nearest(q, nprobe)
      val scanned = indexed.filter(col("cluster_id").isin(probed: _*)).count()
      val ann = AnnIndex.query(indexed, model, "embedding", "vec_id", q, k = 10, nprobe = nprobe)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (ann.intersect(exact).size / 10.0, scanned.toDouble / N)
    }
    val recall = results.map(_._1).sum / results.size
    val maxFrac = results.map(_._2).max
    info(f"recall@10 = $recall%.3f, worst scan fraction = $maxFrac%.3f")
    assert(recall >= 0.95, s"recall@10 $recall below 0.95")
    assert(maxFrac <= 0.10, s"scan fraction $maxFrac above 0.10 (10x reduction)")
  }

  test("farthest-point seeding covers every planted cluster (no empty cells)") {
    val (model, indexed) =
      AnnIndex.fit(corpus, "embedding", "vec_id", k = C, iters = 5)
    val sizes = indexed.groupBy("cluster_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.size == C, s"expected $C non-empty clusters, got ${sizes.size}")
    // no runaway mega-cell: the largest cell must stay within a small
    // multiple of the balanced size, or probes stop bounding the scan
    val maxCell = sizes.values.max
    assert(maxCell <= (N / C) * 3,
      s"largest cell $maxCell vs balanced ${N / C} — probes no longer bound I/O")
  }

  test("PQ on clustered data: recall@10 >= 0.95 at fixed shortlist C = 200") {
    // serving configuration: FIXED re-rank budget, independent of corpus
    // size — the r2 C = N/4 scaling was calibrated for the uniform-random
    // worst case and would erase PQ's advantage at scale (verdict item 2).
    // q99/q102/q104 keep the worst-case exactness gates.
    val model = PqIndex.fitCached(corpus, "annrecall-clustered", "embedding", "vec_id")
    val enc = PqIndex.encodedCached(corpus, "annrecall-clustered", model, "embedding")
    val results = (0 until 5).map { t =>
      val q = ClusteredCorpus.query(t)
      val exact = exactTop10(q)
      val got = PqIndex.search(model, enc, "embedding", "vec_id", q, k = 10, candidates = 200)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      got.intersect(exact).size / 10.0
    }
    val recall = results.sum / results.size
    info(f"PQ ADC recall@10 at C=200/$N = $recall%.3f (re-rank touches ${200.0 / N * 100}%.1f%% of rows)")
    assert(recall >= 0.95, s"PQ recall@10 $recall below 0.95 at C=200")
  }
}
