package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.HashEmbedder
import graft.operators.{PackedScan, VectorStore}

/** The in-memory packed serving path must be EXACT: bit-identical
  * distances (canonical VectorKernels order) and the same (dist, id)
  * tie-break as the DataFrame scan — q108 gates it against DuckDB; this
  * spec pins the bit-parity the oracle's 6-dp rounding can't see.
  */
class PackedScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topK == DataFrame scan: same ids, bit-identical distances") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val scan = PackedScan.buildCached(e, "spec#" + TestSpark.sf, "vec_id", "embedding")
    for (text <- Seq("serving parity probe", "another query", "third probe")) {
      val q = HashEmbedder.embed(text)
      val got = scan.topK(q, 10)
      val ref = VectorStore(e, "embedding", Seq("vec_id"))
        .searchByVector(q, 10)
        .select(col("vec_id"), col("dist"))
        .as[(Long, Double)].collect()
      assert(got.toSeq == ref.toSeq)
    }
  }

  test("row count and dim survive packing; k > n returns all rows") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val n = e.count()
    val scan = PackedScan.buildCached(e, "spec#" + TestSpark.sf, "vec_id", "embedding")
    assert(scan.rows == n)
    assert(scan.dim == HashEmbedder.DefaultDim)
    val q = HashEmbedder.embed("overask probe")
    val all = scan.topK(q, (n + 10).toInt)
    assert(all.length == n)
    // ascending by (dist, id)
    assert(all.toSeq == all.toSeq.sortBy { case (id, d) => (d, id) })
  }

  test("topKBatch: one job, per-query results identical to topK") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val scan = PackedScan.buildCached(e, "spec#" + TestSpark.sf, "vec_id", "embedding")
    val qs = Array.tabulate(7)(i => HashEmbedder.embed(s"batch probe $i"))
    val batch = scan.topKBatch(qs, 10)
    assert(batch.length == qs.length)
    qs.indices.foreach { i =>
      assert(batch(i).toSeq == scan.topK(qs(i), 10).toSeq,
        s"batch result $i diverged from single-query path")
    }
    assert(scan.topKBatch(Array.empty[Array[Float]], 10).isEmpty)
  }

  test("empty source -> empty relation, empty topK") {
    val empty = Tables.embeddings(spark, TestSpark.sf).filter(col("vec_id") < 0)
    val scan = PackedScan.build(empty, "vec_id", "embedding")
    assert(scan.rows == 0L)
    assert(scan.topK(HashEmbedder.embed("x"), 5).isEmpty)
  }
}
