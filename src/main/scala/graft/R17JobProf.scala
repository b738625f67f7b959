package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-17 optimization profiler: run one query warm and print every
  * Spark job it launches (duration, #tasks, description) plus the gaps
  * between jobs (driver-side work: listing, planning, fs ops).
  *
  * `runMain graft.R17JobProf <queryName> [reps]`
  */
object R17JobProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
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

    case class J(id: Int, t0: Long, var t1: Long = 0L, var nTasks: Int = 0,
      var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        j.nTasks = e.stageInfos.map(_.numTasks).sum
        val label = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        j.desc = label.map(_ + " | ").getOrElse("") +
          e.stageInfos.lastOption.map(_.name).getOrElse("")
        jobs.put(e.jobId, j); order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
    }
    // warm run (uncounted) — JIT + caches, like the bench's cold pass
    fn(spark, sfDir).count()
    spark.sparkContext.addSparkListener(listener)
    val walls = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val js = order.asScala.toSeq.map(jobs.get).sortBy(_.t0)
    println(f"[prof] $name walls=${walls.map(w => f"$w%.3f").mkString(" ")}")
    var prevEnd = 0L
    var jobSum = 0L; var gapSum = 0L
    js.foreach { j =>
      val gap = if (prevEnd == 0) 0 else j.t0 - prevEnd
      val dur = j.t1 - j.t0
      jobSum += dur; if (gap > 0) gapSum += gap
      println(f"[prof] job=${j.id}%4d dur=${dur}%5d ms gap_before=${gap}%5d ms tasks=${j.nTasks}%4d ${j.desc.take(70)}")
      prevEnd = j.t1
    }
    println(f"[prof] jobs=${js.size} jobTime=${jobSum} ms gapTime=${gapSum} ms (reps=$reps)")
    spark.stop()
  }
}
