package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the SF dir given
  * by SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A small uncounted warmup pass at sf0.001 runs first: the first window/
  * join/agg query in a fresh JVM otherwise pays ~7 s of one-time JIT +
  * whole-stage-codegen class-loading that has nothing to do with plan
  * quality (measured: q25 cold 7.7 s, warm 0.52 s).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warmup (uncounted, smallest SF): exercises scan/join/agg/window/
    // vector codepaths so JIT + codegen caches are hot.
    val warmupSf = "/root/testdata/sf0.001"
    Seq("q01_pricing_summary", "q03_segment_revenue",
        "q07_top3_orders_per_customer", "q08_running_value_per_user",
        "q20_knn_exact", "q25_knn_per_label")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, warmupSf).count()
        catch { case _: Throwable => }
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
