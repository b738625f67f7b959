package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every query's physical plan for scale red flags. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        // NB: with AQE the pre-execution plan prints isFinalPlan=false and
        // hides WholeStageCodegen spans, so codegen presence can't be
        // audited here (ExpressionSpec/OperatorSpec cover it); BNLJ is
        // expected for scalar-subquery broadcasts and 1-row cross joins
        // (q17/q47/q87) — everything else flags a plan smell.
        val flags = Seq(
          "cartesian" -> plan.contains("CartesianProduct"),
          "bnlj" -> plan.contains("BroadcastNestedLoopJoin"))
          .collect { case (f, true) => f }
        val nEx = "Exchange".r.findAllIn(plan).length
        val nScan = "FileScan".r.findAllIn(plan).length
        println(f"[audit] $name%-28s exchanges=$nEx%2d scans=$nScan%2d ${flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[audit] $name ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
