package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TTL/purge maintenance soak: before trusting the retention story at
  * 100 TB, measure — not re-derive — the cost shape of the round-10
  * serving-tier TTL ops at ~10x the driver bench corpus:
  *
  *   - `idsWhere`: one meta-only job (no distance/score math) — should
  *     be milliseconds against a pinned structure;
  *   - `purgeDeleted` vs a FULL REBUILD from the corpus: the purge reads
  *     only the pinned blocks (no re-tokenize / no re-read), so it must
  *     be decisively cheaper than the rebuild it replaces — that margin
  *     IS the reason the operator exists;
  *   - post-purge serving equality spot-check vs a fresh build over the
  *     survivors (the TtlServingSpec contract at soak scale).
  *
  * Not driver-run; results are committed in PLANS.md ("TTL purge soak").
  */
object TtlSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targetDocs = sys.env.getOrElse("SOAK_ROWS", "500000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    def mb(b: Long): Long = b / (1024 * 1024)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---------------- lexical tier ----------------
    val docs = Tables.documents(spark, sfDir)
    val nd = docs.count()
    val copies = math.max(1L, targetDocs / math.max(1L, nd)).toInt
    val big = docs
      .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
        col("text"))
      .withColumn("ingest_ts", expr(
        "timestampadd(DAY, CAST(doc_id % 30 AS INT), " +
          "timestamp'2024-01-01 00:00:00')"))
    big.cache().count()

    val (ix, tBuild) = timed(operators.Bm25Index.build(
      big, "doc_id", "text", metaCols = Seq("ingest_ts")))
    println(f"[ttl] bm25 corpus=${ix.docCount} docs " +
      f"pinned=${mb(ix.bytes)} MB build=$tBuild%.1f s")

    val (nExp, tTtl) = timed(ix.applyTtl("ingest_ts", "2024-01-10 00:00:00"))
    println(f"[ttl] applyTtl (idsWhere + tombstone): expired=$nExp " +
      f"(${100.0 * nExp / ix.docCount}%.0f%%) in $tTtl%.2f s")

    val (purged, tPurge) = timed(ix.purgeDeleted())
    println(f"[ttl] purgeDeleted: $tPurge%.1f s -> docs=${purged.docCount} " +
      f"tombstones=${purged.deletedCount} pinned=${mb(purged.bytes)} MB")

    val (fresh, tRebuild) = timed(operators.Bm25Index.build(
      big.filter(col("doc_id") % 30 >= 9), "doc_id", "text",
      metaCols = Seq("ingest_ts")))
    println(f"[ttl] full rebuild from corpus (the path purge replaces): " +
      f"$tRebuild%.1f s  (purge is ${tRebuild / tPurge}%.1fx cheaper)")

    val q = Seq("query", "scan", "data")
    val a = purged.topK(q, 20).toSeq
    val b = fresh.topK(q, 20).toSeq
    println(s"[ttl] purged == fresh-rebuild serving: ${a == b}")
    ix.unpersist(); purged.unpersist(); fresh.unpersist()

    // ---------------- graph tier ----------------
    val emb = Tables.embeddings(spark, sfDir)
    val ne = emb.count()
    val gCopies = math.max(1L, 100000L / math.max(1L, ne)).toInt
    val bigE = emb
      .withColumn("__c", explode(sequence(lit(0), lit(gCopies - 1))))
      .select((col("vec_id") + col("__c") * 10000000L).as("vec_id"),
        col("embedding"))
      .withColumn("ingest_ts", expr(
        "timestampadd(DAY, CAST(vec_id % 30 AS INT), " +
          "timestamp'2024-01-01 00:00:00')"))
    val (g, tgBuild) = timed(operators.GraphAnn.build(
      bigE, "vec_id", "embedding", metaCols = Seq("ingest_ts")))
    println(f"[ttl] graph corpus=${g.rows} vecs pinned=${mb(g.bytes)} MB " +
      f"build=$tgBuild%.1f s")
    val (gExp, tgTtl) = timed(g.applyTtl("ingest_ts", "2024-01-10 00:00:00"))
    val (gp, tgPurge) = timed(g.purgeDeleted())
    println(f"[ttl] graph applyTtl=$tgTtl%.2f s (expired=$gExp), " +
      f"purge(rebuild from blocks)=$tgPurge%.1f s -> rows=${gp.rows} " +
      f"tombstones=${gp.deletedCount}")
    g.unpersist(); gp.unpersist()
    spark.stop()
  }
}
