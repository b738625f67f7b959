package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE named SparkEntry query in isolation.
  *
  *   sbt "runMain graft.RunQuery q109_dedup_clusters /root/testdata/sf0.1 3"
  *
  * Runs the query `reps` times (first run = cold JIT + index builds, rest
  * steady-state) and prints per-run wall seconds — the per-query drill-down
  * the whole-suite Bench can't give when one query drifts out of its
  * envelope.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      val tTotal = (System.nanoTime() - t0) / 1e9
      println(f"[runquery] $name run $r: $tTotal%.3f s (build $tBuild%.3f, action ${tTotal - tBuild}%.3f, $n rows)")
    }
    spark.stop()
  }
}
