package graft

import org.apache.spark.sql.SparkSession

/** Round-18 gap profiler: attribute the ~90 ms driver gap each statement
  * action pays (R17JobProf shows it between jobs) to Catalyst phases.
  * Installs a QueryExecutionListener and prints, per completed action,
  * the QueryPlanningTracker phase durations (parsing/analysis/
  * optimization/planning) plus the action wall — the remainder is
  * codegen compilation, AQE replanning, commit fs-ops.
  *
  * `runMain graft.R18GapProf <queryName> [reps]`
  */
object R18GapProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
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
    val fn = SparkEntry.queries.toSeq.find(_._1.startsWith(name))
      .getOrElse(sys.error(s"unknown query $name"))._2

    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val phases = qe.tracker.phases.map { case (p, s) =>
          f"$p=${s.durationMs}%d"
        }.mkString(" ")
        val rules = qe.tracker.topRulesByTime(3).map { case (r, s) =>
          f"${r.split('.').last}=${s.totalTimeNs / 1000000}%dms(${s.numInvocations})"
        }.mkString(" ")
        println(f"[gap] $funcName%-12s wall=${durationNs / 1000000}%5d ms " +
          f"phases: $phases top-rules: $rules")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    fn(spark, sfDir).count() // warm
    spark.listenerManager.register(listener)
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[gap] TOTAL wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    Thread.sleep(1000)
    spark.stop()
  }
}
