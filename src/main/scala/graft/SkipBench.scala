package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-skipping evidence (r10 verdict item 5): MEASURE what parquet
  * row-group min/max pruning buys on a sort-key predicate — ClickHouse's
  * primary-key skip index analog (the reference tunes
  * `index_granularity = 8192`; parquet's row group is the granule) — and
  * what a column BLOOM filter buys on a selective point predicate over a
  * NON-sort-key column (CH's `bloom_filter` skip index analog).
  *
  * Method: replicate events to ~2M rows, write three layouts
  *   A. unsorted (arrival order), 4 MB row groups
  *   B. sorted by ts           — min/max row-group pruning on ts
  *   C. sorted by ts + parquet bloom filter on user_id
  * then run (1) a 1-day ts-range predicate and (2) a single-user point
  * predicate over each, and report per-run BYTES READ (executor input
  * metrics) + rows output + wall. Bytes read is the honest pruning
  * signal: row groups skipped by min/max or bloom are never fetched.
  *
  * Output: one JSON line per (layout, predicate) to stdout; the numbers
  * land in PLANS.md "Data skipping".
  */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // small row groups make pruning granular, like CH's 8192 granule:
      // 2M rows / ~128 KB groups ≈ hundreds of granules
      .config("spark.hadoop.parquet.block.size", (256 * 1024).toString)
      // Spark's default parquet timestamp encoding is INT96, which has NO
      // column statistics — min/max pruning on a ts sort key is silently
      // impossible until this is set (first SkipBench run measured exactly
      // that: stats_min NULL on every ts row group, zero pruning)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = graft.operators.AnnIndex.tmpRoot + "/skipbench"
    val ev = Tables.events(spark, sfDir)
    val n = ev.count()
    val copies = math.max(1L, 2000000L / math.max(1L, n)).toInt
    // replicated rows shift ts by copy index so the time axis stays
    // continuous and sorting is meaningful; user_id re-keys per copy
    val big = ev
      .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
      .select(
        (col("event_id") + col("__c") * 100000000L).as("event_id"),
        (col("user_id") + col("__c") * 1000000L).as("user_id"),
        col("event_type"),
        expr("timestampadd(SECOND, __c * 3, ts)").as("ts"),
        col("value"))

    def write(path: String, df: DataFrame, bloomCol: Option[String]): Unit = {
      if (!new java.io.File(path).exists()) {
        val w = df.coalesce(4).write.mode("overwrite")
        // ndv is PER ROW-GROUP column chunk (~5.3k rows at 256 KB groups);
        // sizing it at the corpus's 2M distinct ids once ballooned each
        // group's bloom to ~2.4 MB and the file 36 -> 416 MB
        bloomCol.fold(w)(c => w
            .option(s"parquet.bloom.filter.enabled#$c", "true")
            .option(s"parquet.bloom.filter.expected.ndv#$c", "8192"))
          .parquet(path)
      }
    }
    // honest scramble: the events table arrives roughly time-ordered and
    // the replication preserves that, so "arrival order" row groups would
    // still carry narrow ts ranges; ordering by a hash makes every row
    // group span the full ts range — the true no-layout baseline
    write(s"$root/unsorted", big.sortWithinPartitions(hash(col("event_id"), col("user_id"))), None)
    write(s"$root/sorted", big.sortWithinPartitions("ts"), None)
    // sortWithinPartitions keeps 4 writer tasks (no extra shuffle); each
    // file covers the full range but its ROW GROUPS are ts-runs, which is
    // what min/max pruning works on
    write(s"$root/sorted_bloom", big.sortWithinPartitions("ts"), Some("user_id"))

    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val rowsRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          bytesRead.addAndGet(m.inputMetrics.bytesRead)
          rowsRead.addAndGet(m.inputMetrics.recordsRead)
        }
      }
    })

    // probe predicates derive from the data so they stay meaningful at
    // any SF: a ~1-day slice of the ts range, one concrete user_id
    val (lo, hi) = {
      val r = big.agg(min("ts"), max("ts")).collect()(0)
      (r.getTimestamp(0), r.getTimestamp(1))
    }
    val dayLo = new java.sql.Timestamp(lo.getTime + (hi.getTime - lo.getTime) / 2)
    val dayHi = new java.sql.Timestamp(dayLo.getTime + 24L * 3600 * 1000)
    // an EXISTING user from replica copy 5 (copies >= 200 at sf0.1), so
    // the point predicate has real matches and the bloom's work is honest
    val probeUser = big.select("user_id").orderBy("user_id")
      .limit(1).collect()(0).getLong(0) + 5L * 1000000L

    def run(tag: String, path: String, pred: DataFrame => DataFrame): Unit = {
      val df = spark.read.parquet(path)
      pred(df).count() // warm fs cache + JIT so bytes, not IO latency, differ
      (1 to 2).foreach { i =>
        bytesRead.set(0); rowsRead.set(0)
        val t0 = System.nanoTime()
        val out = pred(df).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener drain
        if (i == 2) println(s"""{"tag":"$tag","rows_out":$out,""" +
          s""""bytes_read_mb":${bytesRead.get / 1048576.0},""" +
          s""""rows_read":${rowsRead.get},"sec":${math.rint(sec * 1000) / 1000}}""")
      }
    }

    val tsPred = (df: DataFrame) =>
      df.filter(col("ts") >= lit(dayLo) && col("ts") < lit(dayHi))
    val userPred = (df: DataFrame) => df.filter(col("user_id") === probeUser)

    println(s"""{"corpus_rows":${copies * n},"ts_range":["$lo","$hi"]}""")
    run("ts_range/unsorted", s"$root/unsorted", tsPred)
    run("ts_range/sorted", s"$root/sorted", tsPred)
    run("user_eq/sorted_nobloom", s"$root/sorted", userPred)
    run("user_eq/sorted_bloom", s"$root/sorted_bloom", userPred)
    // control: full scan (no predicate) pins the un-pruned byte ceiling
    run("full/sorted", s"$root/sorted", identity)
    spark.stop()
  }
}
