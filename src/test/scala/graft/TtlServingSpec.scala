package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, Bm25Index, GraphAnn, IvfGraph, PackedScan, SelfQueryFilter => F}

/** Serving-tier TTL (SURVEY §14 item 7): age-out by pinned metadata on
  * the live Bm25/graph tiers, and the purge contract that bounds the
  * tombstone array — purgeDeleted() must be indistinguishable from a
  * fresh build over the surviving corpus.
  */
class TtlServingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpusDf = {
    val words = Seq("query", "scan", "data", "merge", "sort", "index")
    (0L until 120L).map { id =>
      val text = (0 to (id % 7).toInt)
        .map(j => words(((id + j) % words.length).toInt)).mkString(" ")
      (id, text, java.sql.Timestamp.valueOf(
        f"2024-01-${(id % 28 + 1)}%02d 00:00:00"))
    }.toDF("doc_id", "text", "ingest_ts")
  }

  test("bm25: applyTtl tombstones exactly the aged docs; idsWhere enumerates") {
    val ix = Bm25Index.build(corpusDf, "doc_id", "text",
      metaCols = Seq("ingest_ts"))
    try {
      val ids = ix.idsWhere(F.Lt("ingest_ts", F.T("2024-01-10 00:00:00")))
      assert(ids.toSet == (0L until 120L).filter(_ % 28 < 9).toSet)
      val n = ix.applyTtl("ingest_ts", "2024-01-10 00:00:00")
      assert(n == ids.length && ix.deletedCount == n)
      // already-tombstoned docs don't re-enumerate
      assert(ix.idsWhere(F.Lt("ingest_ts", F.T("2024-01-10 00:00:00"))).isEmpty)
    } finally ix.unpersist()
  }

  test("bm25: purgeDeleted == fresh build over survivors (stats move)") {
    val ix = Bm25Index.build(corpusDf, "doc_id", "text",
      metaCols = Seq("ingest_ts"))
    val fresh = Bm25Index.build(
      corpusDf.filter(col("doc_id") % 28 >= 9), "doc_id", "text",
      metaCols = Seq("ingest_ts"))
    try {
      ix.applyTtl("ingest_ts", "2024-01-10 00:00:00")
      val purged = ix.purgeDeleted()
      try {
        // tombstones bounded: purge resets them to zero
        assert(purged.deletedCount == 0)
        assert(purged.docCount == fresh.docCount)
        assert(purged.sumDl == fresh.sumDl)
        // bit-identical serving incl. the recomputed df/N/avgdl
        val q = Seq("query", "scan", "data")
        assert(purged.topK(q, 25).toSeq == fresh.topK(q, 25).toSeq)
        // and metadata survives the purge: a further filtered query works
        val f = Some(F.Gte("ingest_ts", F.T("2024-01-20 00:00:00")): F.Node)
        assert(purged.topK(q, 25, f).toSeq == fresh.topK(q, 25, f).toSeq)
      } finally purged.unpersist()
    } finally { ix.unpersist(); fresh.unpersist() }
  }

  test("bm25: idsWhere without pinned metadata is loud") {
    val ix = Bm25Index.build(corpusDf, "doc_id", "text")
    try {
      val e = intercept[IllegalArgumentException] {
        ix.idsWhere(F.Lt("ingest_ts", F.T("2024-01-10 00:00:00")))
      }
      assert(e.getMessage.contains("metadata"))
    } finally ix.unpersist()
  }

  test("packed scan: applyTtl tombstones by pinned ts; compact purges") {
    val dim = 8
    def vec(id: Long): Array[Float] =
      Array.tabulate(dim)(j => (((id * 13 + j * 7) % 31).toFloat - 15) / 15f)
    val rows = (0L until 150L).map { id =>
      (id, vec(id), java.sql.Timestamp.valueOf(
        f"2024-01-${(id % 28 + 1)}%02d 00:00:00"))
    }.toDF("vec_id", "embedding", "ingest_ts")
    val ps = PackedScan.build(rows, "vec_id", "embedding",
      metaCols = Seq("ingest_ts"))
    val fresh = PackedScan.build(rows.filter(col("vec_id") % 28 >= 9),
      "vec_id", "embedding", metaCols = Seq("ingest_ts"))
    try {
      val n = ps.applyTtl("ingest_ts", "2024-01-10 00:00:00")
      assert(n == (0L until 150L).count(_ % 28 < 9))
      val purged = ps.compact() // PackedScan's purge: drops tombstoned rows
      try {
        assert(purged.deletedCount == 0 && purged.rows == 150L - n)
        val q = vec(777L)
        assert(purged.topK(q, 12).toSeq == fresh.topK(q, 12).toSeq)
      } finally purged.unpersist()
    } finally { ps.unpersist(); fresh.unpersist() }
  }

  test("ivf-graph: applyTtl + meta-capable purge keeps routing valid") {
    val dim = 12
    def vec(id: Long): Array[Float] =
      Array.tabulate(dim)(j => (((id * 29 + j * 11) % 53).toFloat - 26) / 26f)
    val rows = (0L until 300L).map { id =>
      (id, vec(id), java.sql.Timestamp.valueOf(
        f"2024-01-${(id % 28 + 1)}%02d 00:00:00"))
    }.toDF("vec_id", "embedding", "ingest_ts")
    val (model, indexed) = AnnIndex.fit(rows, "embedding", "vec_id",
      k = 4, iters = 5)
    val g = IvfGraph.build(indexed, model, "vec_id", "embedding",
      metaCols = Seq("ingest_ts"))
    try {
      val n = g.applyTtl("ingest_ts", "2024-01-10 00:00:00")
      assert(n == (0L until 300L).count(_ % 28 < 9))
      val purged = g.purgeDeleted()
      try {
        assert(purged.deletedCount == 0 && purged.rows == 300L - n)
        // exactness contract: nprobe=k + full ef == exhaustive over the
        // survivors — compare against the tombstoned-but-unpurged index
        val q = vec(4242L)
        val (a, _) = purged.topKBatch(Array(q), 10, nprobe = 4,
          ef = purged.rows.toInt)
        val (b, _) = g.topKBatch(Array(q), 10, nprobe = 4, ef = g.rows.toInt)
        assert(a(0).toSeq == b(0).toSeq)
        // metadata survived the purge: filtered serving still binds
        val f = Some(F.Gte("ingest_ts", F.T("2024-01-20 00:00:00")): F.Node)
        val (c, _) = purged.topKBatch(Array(q), 10, nprobe = 4,
          ef = purged.rows.toInt, filter = f)
        assert(c(0).nonEmpty)
      } finally purged.unpersist()
    } finally g.unpersist()
  }

  test("graph: applyTtl + purge == fresh build over survivors (exact path)") {
    val dim = 16
    def vec(id: Long): Array[Float] =
      Array.tabulate(dim)(j => (((id * 31 + j * 17) % 97).toFloat - 48) / 48f)
    val rows = (0L until 200L).map { id =>
      (id, vec(id), java.sql.Timestamp.valueOf(
        f"2024-01-${(id % 28 + 1)}%02d 00:00:00"))
    }.toDF("vec_id", "embedding", "ingest_ts")
    val g = GraphAnn.build(rows, "vec_id", "embedding",
      metaCols = Seq("ingest_ts"))
    val fresh = GraphAnn.build(rows.filter(col("vec_id") % 28 >= 9),
      "vec_id", "embedding", metaCols = Seq("ingest_ts"))
    try {
      val n = g.applyTtl("ingest_ts", "2024-01-10 00:00:00")
      assert(n == (0L until 200L).count(_ % 28 < 9))
      val purged = g.purgeDeleted()
      try {
        assert(purged.deletedCount == 0)
        assert(purged.rows == g.rows - n)
        val q = vec(9999L)
        val (a, _) = purged.topKBatchBrute(Array(q), 15)
        val (b, _) = fresh.topKBatchBrute(Array(q), 15)
        assert(a(0).toSeq == b(0).toSeq)
        // full-ef beam (exact contract) agrees too — the purged graph is
        // a real graph, not just filtered storage
        val (c, _) = purged.topKBatch(Array(q), 15, ef = purged.rows.toInt)
        assert(c(0).toSeq == a(0).toSeq)
      } finally purged.unpersist()
    } finally { g.unpersist(); fresh.unpersist() }
  }
}
