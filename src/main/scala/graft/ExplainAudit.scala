package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q201_stat_tests", "q207_matrix_stats", "q198_entropy")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        .toString.linesIterator.take(22).mkString("\n"))
    }
    spark.stop()
  }
}
