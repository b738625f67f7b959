package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LangId at scale: train char-bigram profiles on a replicated multi-
  * hundred-MB corpus, then measure the MAP-ONLY scoring rate — the shape
  * that matters at 100 TB (training is one word-count job whose output
  * is #langs x topK rows; scoring must run at scan speed with zero
  * shuffle). Prints one JSON line; numbers land in PLANS "LangId soak".
  */
object LangIdSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)

    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val copies = math.max(1L, 200000L / math.max(1L, n)).toInt
    val path = graft.operators.AnnIndex.tmpRoot + "/langid_soak.parquet"
    if (!new java.io.File(path).exists()) {
      docs.withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
        .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
          col("lang"), col("text"))
        .repartition(8).write.mode("overwrite").parquet(path)
    }
    val big = spark.read.parquet(path)
    val total = big.count()

    // shuffle telemetry: scoring must be ZERO-shuffle
    val shuffle = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val t0 = System.nanoTime()
    val prof = graft.operators.LangId.profiles(big, "lang", "text")
    val mdl = graft.operators.LangId.model(prof, 2, 15000000L)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val profRows = mdl.grams.size()

    def score(): Double = {
      val t = System.nanoTime()
      graft.operators.LangId.classifyWith(big, mdl, "doc_id", "text").count()
      (System.nanoTime() - t) / 1e9
    }
    score() // warm
    shuffle.set(0)
    val sec = (1 to 3).map(_ => score()).min
    Thread.sleep(400)
    println(s"""{"docs":$total,"copies":$copies,"train_sec":${math.rint(trainSec * 100) / 100},""" +
      s""""profile_grams":$profRows,"langs":${mdl.langs.length},""" +
      s""""score_sec":${math.rint(sec * 100) / 100},"docs_per_sec":${(total / sec).toLong},""" +
      s""""score_shuffle_mb":${shuffle.get / 1048576.0}}""")
    spark.stop()
  }
}
