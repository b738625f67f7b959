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
    // LEX_CORPUS=zipf swaps the replicated driver table (31-term vocab —
    // EVERY query term 40-80% df, the adversarial all-common shape) for
    // [[ZipfCorpus]] (LEX_DOCS docs over a LEX_VOCAB-term Zipf(1.0)
    // vocabulary) — the realistic spectrum where max-score has common
    // terms to demote. Probe terms are picked by RANK ("t1" is the most
    // common), measured dfs printed beside the results.
    val zipf = sys.env.get("LEX_CORPUS").contains("zipf")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val bigDocs =
      if (zipf)
        ZipfCorpus.df(spark,
          sys.env.getOrElse("LEX_DOCS", "2000000").toLong,
          sys.env.getOrElse("LEX_VOCAB", "30000").toInt)
      else {
        val docs = Tables.documents(spark, sfDir)
        val nd = docs.count()
        val copies = math.max(1L, 200000L / math.max(1L, nd)).toInt
        docs
          .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
          .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"), col("text"))
      }
    val ix = operators.Bm25Index.buildCached(bigDocs,
      (if (zipf) "lexbench#zipf" else "lexbench#" + sfDir), "doc_id", "text")

    val mixes: Seq[(String, Seq[String])] =
      if (zipf) Seq(
        "common3" -> Seq("t1", "t2", "t3"),
        "common1" -> Seq("t1"),
        "mixed3" -> Seq("t1", "t100", "t5000"),
        "mid3" -> Seq("t100", "t150", "t200"),
        "rare3" -> Seq("t9000", "t9500", "t10000"))
      else {
        // term-frequency spectrum of the corpus, most common first
        val docs = Tables.documents(spark, sfDir)
        val vocab = docs.select(explode(operators.Bm25Index.tokens(col("text"))).as("w"))
          .groupBy("w").count().orderBy(desc("count"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        println(s"[lexbench] vocab=${vocab.length}; top terms: " +
          vocab.take(5).map { case (w, c) => s"$w($c)" }.mkString(", "))
        Seq(
          "common3" -> vocab.take(3).map(_._1).toSeq,
          "common1" -> Seq(vocab.head._1),
          "mixed3" -> Seq("query", "scan", "data"), // the driver-bench probe
          "mid3" -> vocab.slice(vocab.length / 4, vocab.length / 4 + 3).map(_._1).toSeq,
          "rare3" -> vocab.takeRight(3).map(_._1).toSeq)
      }
    // measured df of every probe term (one job), so results read with
    // their real selectivities beside them
    val probeTerms = mixes.flatMap(_._2).distinct
    val dfs = bigDocs
      .select(explode(array_distinct(operators.Bm25Index.tokens(col("text")))).as("w"))
      .filter(col("w").isin(probeTerms: _*))
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    println(s"[lexbench] corpus=${ix.docCount} docs; probe dfs: " +
      probeTerms.map(t => s"$t=${dfs.getOrElse(t, 0L)}").mkString(", "))
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
    // driver bench's own term pool (zipf: a rank spread over the same
    // common/mid/rare spectrum)
    val pool =
      if (zipf) Array("t1", "t5", "t20", "t60", "t100", "t200", "t400",
        "t800", "t1500", "t3000", "t5000", "t7000", "t9000", "t10000",
        "t2", "t150")
      else Array("query", "scan", "data", "vector", "index", "search",
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
