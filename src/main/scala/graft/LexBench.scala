package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Max-score vs exhaustive lexical-serving harness (not driver-run):
  * the before/after evidence for the r8 pruning change. Builds the same
  * ~200k-doc replicated corpus the driver bench uses and times
  * [[graft.operators.Bm25Index.topKBatch]] (max-score, the serving path)
  * against [[graft.operators.Bm25Index.topKBatchExhaustive]] (the pre-r8
  * all-postings walk, kept as the parity baseline) on term mixes from
  * very common to rare, single and Q=16-batched, printing per-mix qps
  * and the speedup ratio. Results recorded in PLANS.md §bench notes.
  */
object LexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val docs = Tables.documents(spark, sfDir)
    val nd = docs.count()
    val copies = math.max(1L, 200000L / math.max(1L, nd)).toInt
    val bigDocs = docs
      .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"), col("text"))
    val ix = operators.Bm25Index.buildCached(bigDocs, "lexbench#" + sfDir,
      "doc_id", "text")
    // term-frequency spectrum of the corpus, most common first
    val vocab = docs.select(explode(operators.Bm25Index.tokens(col("text"))).as("w"))
      .groupBy("w").count().orderBy(desc("count"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    println(s"[lexbench] corpus=${ix.docCount} docs, vocab=${vocab.length}; " +
      s"top terms: ${vocab.take(5).map { case (w, c) => s"$w($c)" }.mkString(", ")}")

    val mixes: Seq[(String, Seq[String])] = Seq(
      "common3" -> vocab.take(3).map(_._1).toSeq,
      "common1" -> Seq(vocab.head._1),
      "mixed3" -> Seq("query", "scan", "data"), // the driver-bench probe
      "mid3" -> vocab.slice(vocab.length / 4, vocab.length / 4 + 3).map(_._1).toSeq,
      "rare3" -> vocab.takeRight(3).map(_._1).toSeq)
    val k = 20
    def time(run: () => Unit): Double = {
      run() // warm
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      reps.min
    }
    for ((name, terms) <- mixes) {
      val sP = time(() => ix.topKBatch(Seq(terms), k))
      val sE = time(() => ix.topKBatchExhaustive(Seq(terms), k))
      println(f"[lexbench] $name%-8s single: pruned ${1 / sP}%8.1f qps, " +
        f"exhaustive ${1 / sE}%8.1f qps, speedup ${sE / sP}%5.2fx")
    }
    // the batched configuration (Q=16 3-term queries, one job) on the
    // driver bench's own term pool
    val pool = Array("query", "scan", "data", "vector", "index", "search",
      "engine", "distributed", "the", "of", "a", "join", "stream", "graph",
      "model", "table")
    val qs = Seq.tabulate(16)(i =>
      Seq(pool(i % 16), pool((i + 5) % 16), pool((i + 11) % 16)))
    val sP = time(() => ix.topKBatch(qs, k))
    val sE = time(() => ix.topKBatchExhaustive(qs, k))
    println(f"[lexbench] batch16  : pruned ${16 / sP}%8.1f qps, " +
      f"exhaustive ${16 / sE}%8.1f qps, speedup ${sE / sP}%5.2fx")
    spark.stop()
  }
}
