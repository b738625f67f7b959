package graft

import org.apache.spark.sql.SparkSession

/** Round-17 optimization probe: time a set of queries (3 reps each, warm
  * session) and dump each one's `explain("formatted")` to plans/r17/.
  *
  * `runMain graft.R17Probe <out-suffix> <q1,q2,...>` — suffix "before" /
  * "after" names the plan files; query names may be short ("q251")
  * prefixes.
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val wanted = args(1).split(",").toSeq
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
    val byShort = SparkEntry.queries.toSeq
      .map(q => q._1.takeWhile(_ != '_') -> q).toMap
    val outDir = new java.io.File("plans/r17")
    outDir.mkdirs()
    wanted.foreach { short =>
      val (name, fn) = byShort.getOrElse(short,
        sys.error(s"unknown query prefix $short"))
      spark.sparkContext.setJobDescription(name)
      // plan dump (pre-execution; AQE isFinalPlan=false, as committed in
      // earlier rounds' plans/ evidence)
      val df = fn(spark, sfDir)
      val planTxt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val fw = new java.io.FileWriter(s"plans/r17/${short}_$suffix.txt")
      fw.write(planTxt); fw.close()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-40s ${times.map(t => f"$t%.3f").mkString(" ")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
