package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 2M-row serving soak (the r7/r8 verdicts' carried item): before anyone
  * trusts the 100 TB story, run the two serving tiers at 10x the driver
  * bench's corpus and MEASURE — not re-derive — that the accumulators
  * stay bounded and the throughput holds:
  *
  *  - per-shard accumulators: the BM25 k-slot heap and PackedScan's
  *    bounded insertion both cap at k rows per (shard, query); the soak
  *    reads the actual per-shard list sizes off `topKBatchPerShard` /
  *    `topKBatchPerPart`,
  *  - driver merge: <= P x k rows per query (Q x P x k per batch), which
  *    is what keeps serving driver-safe at ANY corpus size — P grows
  *    with the cluster, not with rows,
  *  - sustained qps over a multi-window loop (10 s windows), so a
  *    one-off warm number can't hide a leak or a degrading structure.
  *
  * Not driver-run; results are committed in PLANS.md ("2M-row serving
  * soak"). Corpus = sf0.1 documents/embeddings replicated with id
  * offsets (the LexBench recipe at 10x), so term statistics and vector
  * clustering keep their shapes while N scales.
  */
object ServingSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targetRows = sys.env.getOrElse("SOAK_ROWS", "2000000").toLong
    val soakSecs = sys.env.getOrElse("SOAK_SECS", "45").toInt
    val tier = sys.env.getOrElse("SOAK_TIER", "all") // bm25 | packed | all
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val k = 10
    def mb(b: Long): Long = b / (1024 * 1024)
    def usedMb(): Long = {
      val r = Runtime.getRuntime; mb(r.totalMemory - r.freeMemory)
    }
    /** Loop `run` (a batch of `q` queries) for `secs`, report per-10s
      * window qps min/med/max — sustained, not best-of. */
    def soak(name: String, q: Int, secs: Int)(run: () => Unit): Unit = {
      run() // warm
      val windows = scala.collection.mutable.ArrayBuffer.empty[Double]
      val tEnd = System.nanoTime() + secs * 1000000000L
      var wStart = System.nanoTime(); var wQueries = 0L
      while (System.nanoTime() < tEnd) {
        run(); wQueries += q
        val now = System.nanoTime()
        if (now - wStart >= 10000000000L) {
          windows += wQueries * 1e9 / (now - wStart)
          wStart = now; wQueries = 0
        }
      }
      val w = windows.sorted
      if (w.nonEmpty)
        println(f"[soak] $name%-22s windows=${w.length} qps " +
          f"min=${w.head}%8.1f med=${w(w.length / 2)}%8.1f max=${w.last}%8.1f" +
          f"  heapUsed=${usedMb()} MB")
    }

    // ---------------- lexical tier: ~2M docs ----------------
    if (tier == "bm25" || tier == "all") {
    val docs = Tables.documents(spark, sfDir)
    val nd = docs.count()
    val copies = math.max(1L, targetRows / math.max(1L, nd)).toInt
    val bigDocs = docs
      .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"), col("text"))
    var t0 = System.nanoTime()
    val ix = operators.Bm25Index.build(bigDocs, "doc_id", "text")
    val shards = ix.blocksRdd.getNumPartitions
    println(f"[soak] bm25 corpus=${ix.docCount} docs, shards=$shards, " +
      f"pinned=${mb(ix.bytes)} MB, build=${(System.nanoTime() - t0) / 1e9}%.1f s")

    val pool = Array("query", "scan", "data", "vector", "index", "search",
      "engine", "distributed", "the", "of", "a", "join", "stream", "graph",
      "model", "table")
    val qs16: Seq[Seq[String]] = Seq.tabulate(16)(i =>
      Seq(pool(i % 16), pool((i + 5) % 16), pool((i + 11) % 16)))
    // accumulator / merge-input measurement on the batch shape
    val per = ix.topKBatchPerShard(qs16, k)
    val listSizes = per.iterator.flatMap(_.iterator.map(_.length)).toArray
    val mergeRows = listSizes.sum
    println(s"[soak] bm25 batch16: non-empty shards=${per.length}, " +
      s"max per-shard list=${listSizes.max} (bound $k), " +
      s"merge input=$mergeRows rows (bound ${shards * k * 16}), " +
      s"merge input/query=${mergeRows / 16} (bound ${shards * k})")
    soak("bm25 single (mixed3)", 1, soakSecs / 2)(
      () => ix.topKBatch(Seq(Seq("query", "scan", "data")), k))
    soak("bm25 batch16", 16, soakSecs)(() => ix.topKBatch(qs16, k))
    ix.unpersist()
    }

    // ---------------- vector tier: ~2M vectors ----------------
    if (tier == "packed" || tier == "all") {
    val emb = Tables.embeddings(spark, sfDir)
    val ne = emb.count()
    val vcopies = math.max(1L, targetRows / math.max(1L, ne)).toInt
    // repartition: the sf0.1 source is ONE parquet file, and a serving
    // corpus packed into one partition has no scan parallelism — the
    // production shape is one block per core/executor slot
    val bigVecs = emb
      .withColumn("__c", explode(sequence(lit(0), lit(vcopies - 1))))
      .select((col("vec_id") + col("__c") * 10000000L).as("vec_id"),
        col("embedding"))
      .repartition(32)
    var t0 = System.nanoTime()
    val ps = operators.PackedScan.build(bigVecs, "vec_id", "embedding")
    val parts = ps.blockCounts.length
    println(f"[soak] packed corpus=${ps.rows} vecs x dim=${ps.dim}, " +
      f"partitions=$parts, pinned=${mb(ps.bytes)} MB, " +
      f"build=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val qvecs: Array[Array[Float]] = emb.orderBy("vec_id").limit(16)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val perV = ps.topKBatchPerPart(qvecs, k)
    val vSizes = perV.iterator.flatMap(_.iterator.map(_.length)).toArray
    val vMerge = vSizes.sum
    println(s"[soak] packed batch16: partitions returned=${perV.length}, " +
      s"max per-part list=${vSizes.max} (bound $k), " +
      s"merge input=$vMerge rows (bound ${parts * k * 16}), " +
      s"merge input/query=${vMerge / 16} (bound ${parts * k})")
    soak("packed single", 1, soakSecs / 2)(() => ps.topKBatch(qvecs.take(1), k))
    soak("packed batch16", 16, soakSecs)(() => ps.topKBatch(qvecs, k))
    ps.unpersist()
    }

    // ---------------- graph tier: ~2M clustered vectors ----------------
    if (tier == "graph" || tier == "all") {
    val corpus = ClusteredCorpus.df(spark, targetRows, 64)
      .repartition(32).cache()
    corpus.count()
    var t0 = System.nanoTime()
    val g = operators.GraphAnn.build(corpus, "vec_id", "embedding")
    println(f"[soak] graph corpus=${g.rows} vecs, blocks=32, " +
      f"pinned=${mb(g.bytes)} MB, build=${(System.nanoTime() - t0) / 1e9}%.1f s")
    corpus.unpersist()
    val gq = Array.tabulate(16)(i => ClusteredCorpus.query(i % 8))
    val ef = 64
    val (res, visited) = g.topKBatch(gq, k, ef)
    println(s"[soak] graph batch16: visited/query=${visited / gq.length} " +
      f"(${visited * 100.0 / (gq.length.toLong * g.rows)}%.2f%% of corpus), " +
      s"merge bound P*max(k,ef)=${32 * math.max(k, ef)}/query, " +
      s"results/query=${res.map(_.length).max}")
    soak("graph single", 1, soakSecs / 2)(() => g.topKBatch(gq.take(1), k, ef))
    soak("graph batch16", 16, soakSecs)(() => g.topKBatch(gq, k, ef))
    g.unpersist()
    }

    println(f"[soak] final heapUsed=${usedMb()} MB of " +
      f"${mb(Runtime.getRuntime.maxMemory)} MB max")
    spark.stop()
  }
}
