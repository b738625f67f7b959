package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, SelfQueryFilter => F}

/** Filtered-ANN dispatch crossover harness (not driver-run): measures
  * the filtered BEAM (serving ef) against the exact filtered BRUTE
  * force over the same pinned graph blocks across a selectivity sweep,
  * plus each path's work metric (nodes visited / distances computed).
  * The numbers behind [[GraphAnn.DefaultBruteBelow]] — recorded in
  * PLANS.md §dispatch.
  *
  * lbl = vec_id % 1000 and the predicate is Lte(lbl, x), so x sweeps
  * survivor fraction directly: x=4 → 0.5%, x=999 → 100%.
  */
object AnnDispatchBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // N and block count are env-tunable so the same harness measures the
    // block-size dependence of the crossover (PLANS §dispatch argues the
    // brute gate pass is O(block rows) while beam's visited set is
    // block-size-independent — DISPATCH_N=400000 at the same 8 blocks
    // quadruples rows/block and lets us SEE the crossover move).
    val n = sys.env.getOrElse("DISPATCH_N", "100000").toLong
    val blocks = sys.env.getOrElse("DISPATCH_BLOCKS", "8").toInt
    val c = 64
    val corpus = ClusteredCorpus.df(spark, n, c)
      .withColumn("lbl", (col("vec_id") % 1000).cast("long"))
      .repartition(blocks).cache()
    corpus.count()
    println(s"[dispatch] building graph over $n clustered vectors, " +
      s"$blocks blocks (${n / blocks} rows/block)")
    val t0 = System.nanoTime()
    val g = GraphAnn.build(corpus, "vec_id", "embedding", metaCols = Seq("lbl"))
    g.rows // force
    println(f"[dispatch] build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val qs = Array.tabulate(8)(i => ClusteredCorpus.query(i))
    def time(run: () => Unit): Double = {
      run() // warm
      (1 to 5).map { _ =>
        val t = System.nanoTime(); run(); (System.nanoTime() - t) / 1e9
      }.min
    }
    for (x <- Seq(0, 4, 9, 19, 49, 99, 249, 499, 999)) {
      val f: Option[F.Node] = Some(F.Lte("lbl", F.I(x.toLong)))
      val sel = g.estimateSelectivity(f.get)
      var beamVisited = 0L
      var bruteVisited = 0L
      val sBeam = time(() => {
        beamVisited = g.topKBatch(qs, 10, ef = 64, f)._2
      })
      val sBrute = time(() => {
        bruteVisited = g.topKBatchBrute(qs, 10, f)._2
      })
      println(f"[dispatch] sel=$sel%6.4f  beam ${qs.length / sBeam}%7.1f qps " +
        f"(visited ${beamVisited / qs.length}%7d/q)  brute ${qs.length / sBrute}%7.1f qps " +
        f"(dists ${bruteVisited / qs.length}%7d/q)  beam/brute ${sBrute / sBeam}%5.2fx")
    }
    spark.stop()
  }
}
