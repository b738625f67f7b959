package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ExactSubstr at volume (round 12): the operator's cost is ONE shuffle
  * of every L-token window — O(corpus tokens) rows — so the soak
  * measures exactly that on a synthetic corpus with planted boilerplate
  * (the shape real training data has: a small set of shared spans
  * repeated across ~1% of docs, everything else unique). Reports
  * corpus size, wall, token throughput, shuffle volume, and the found
  * coverage (sanity: exactly the planted spans). Numbers land in
  * PLANS.md ("ExactSubstr soak").
  */
object ExactSubstrSoak {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SOAK_DOCS", "100000").toLong
    val docTokens = 256
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    // unique filler tokens from per-(doc, position) hashes; every 100th
    // doc carries a fixed 40-token boilerplate at offset 50
    val boiler = (1 to 40).map(i => s"boiler$i").mkString(" ")
    def filler(tag: String, n: Int) =
      array_join(transform(sequence(lit(1), lit(n)), i =>
        concat(lit(tag), pmod(xxhash64(col("id"), i, lit(tag)),
          lit(1000000000000L)))), " ")
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ",
        filler("u", 50),
        when(col("id") % 100 === 0, lit(boiler)).otherwise(filler("v", 40)),
        filler("w", docTokens - 90)).as("text"))
      .localCheckpoint() // corpus generation off the measured clock

    val t0 = System.nanoTime()
    val r = graft.operators.Dedup
      .exactSubstrDuplication(docs, "doc_id", "text", 8)
      .agg(count(lit(1)).as("docs"), sum("dup_tokens").as("dup")).collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val totalTokens = nDocs * docTokens
    println(f"corpus: $nDocs docs x $docTokens tokens = $totalTokens tokens")
    println(f"exactSubstr(L=8): $sec%6.1f s = ${totalTokens / sec / 1e6}%5.1f M tokens/s; " +
      f"shuffle ${shuffleBytes.get / 1048576} MB")
    println(s"flagged docs=${r.getLong(0)} dup_tokens=${r.getLong(1)} " +
      s"(planted: ${nDocs / 100} docs x 40 tokens = ${nDocs / 100 * 40})")
    spark.stop()
  }
}
