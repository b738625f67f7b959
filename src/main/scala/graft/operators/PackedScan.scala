package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import org.apache.spark.sql.graft.VectorKernels

/** MEMOIZED IN-MEMORY PACKED RELATION — the repeated-query serving path
  * for exact k-NN.
  *
  * The parquet scan path (q20/q91) is the right plan for a first query:
  * one pass, zero exchanges, TakeOrderedAndProject. But a SERVING workload
  * re-scans the same corpus per query, and there the bottleneck is not
  * the distance kernel (a cached tight loop sustains ~34 M vectors/s on
  * 32 threads — KnnBench ceiling probe) but parquet re-decode and per-row
  * UnsafeRow materialization. This operator removes both: each partition
  * is pinned as ONE contiguous float[] (dim-strided) plus a long[] of
  * ids, persisted MEMORY_ONLY as plain JVM arrays, and a query is one
  * `runJob` that walks the block with [[VectorKernels.cosineStrided]]
  * into a bounded per-partition top-k, merged on the driver.
  *
  * This is the same structure a 1000-executor serving tier would hold:
  * hot partitions pinned executor-side, queries scatter-gather per-
  * partition top-k (the scatter-gather shape MyScale's distributed MSTG
  * queries have; the reference delegates it wholesale,
  * `app/backend/vector_store/myscale_without_metadata.py:28-36`).
  *
  * Results are BIT-identical to the DataFrame scans: cosineStrided
  * reduces in the canonical VectorKernels order, and ties break by id
  * exactly like `.orderBy(dist, id)` — so the whole path is oracle-gated
  * (q108) against the same DuckDB SQL as q20.
  */
final class PackedScan private (
    blocks: RDD[PackedScan.Block], val dim: Int, val rows: Long,
    val bytes: Long) {

  /** Exact top-k (id, cosine distance), ascending by (dist, id). */
  def topK(q: Array[Float], k: Int): Array[(Long, Double)] =
    topKBatch(Array(q), k).head

  /** BATCHED exact top-k: Q queries answered in ONE Spark job.
    *
    * A serving workload is concurrent — the reference serves several
    * users over 3+ tables at once (`app/backend/construct/build_all.py:
    * 34-49`) — and one Spark job per query makes scheduling overhead the
    * bottleneck (measured: a single served query runs BELOW the one-pass
    * parquet scan). Batching fixes the economics twice over: one job
    * amortizes the ~5 ms scheduling cost across Q queries, and the
    * row-outer/query-inner loop reads each pinned vector from memory ONCE
    * for all Q distance computations (the vector stays in L1 across the
    * inner loop), so memory traffic is rows×dim×4 B per BATCH instead of
    * per query.
    *
    * Per query the result is the identical bounded insertion + (dist, id)
    * merge as the single-query path — `topK` IS `topKBatch` of one, so
    * q108's oracle gate covers both.
    */
  def topKBatch(qs: Array[Array[Float]], k: Int): Array[Array[(Long, Double)]] = {
    if (qs.isEmpty) return Array.empty
    val nq = qs.length
    val qnorms = qs.map(q => math.sqrt(VectorKernels.norm2(q)))
    val perPart = blocks.mapPartitions { it =>
      // bounded insertion top-k per (partition, query): k is tiny (10ish),
      // so the branch-predictable insertion beats a heap
      val bestD = Array.fill(nq)(Array.fill(k)(Double.PositiveInfinity))
      val bestId = Array.fill(nq)(Array.fill(k)(Long.MaxValue))
      val found = new Array[Int](nq)
      it.foreach { b =>
        val n = b.ids.length
        val dim = b.dim
        var r = 0
        while (r < n) {
          val off = r * dim
          val id = b.ids(r)
          var qi = 0
          while (qi < nq) {
            val d = VectorKernels.cosineStrided(b.vecs, off, dim, qs(qi), qnorms(qi))
            val bd = bestD(qi)
            val bi = bestId(qi)
            val worst = bd(k - 1)
            if (d < worst || (d == worst && id < bi(k - 1))) {
              var p = k - 1
              while (p > 0 && (d < bd(p - 1) ||
                  (d == bd(p - 1) && id < bi(p - 1)))) {
                bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
              }
              bd(p) = d; bi(p) = id
              if (found(qi) < k) found(qi) += 1
            }
            qi += 1
          }
          r += 1
        }
      }
      Iterator.single(Array.tabulate(nq)(qi =>
        Array.tabulate(found(qi))(i => (bestId(qi)(i), bestD(qi)(i)))))
    }.collect()
    Array.tabulate(nq) { qi =>
      perPart.iterator.flatMap(_(qi))
        .toArray.sortBy { case (id, d) => (d, id) }.take(k)
    }
  }

  /** Top-k as a DataFrame (vec_id, dist) for plan composition / gating. */
  def topKDF(spark: SparkSession, q: Array[Float], k: Int): DataFrame = {
    import spark.implicits._
    topK(q, k).toSeq.toDF("vec_id", "dist")
  }

  def unpersist(): Unit = blocks.unpersist()
}

object PackedScan {

  /** One partition's pinned data: ids[i] owns vecs[i*dim, (i+1)*dim). */
  final case class Block(ids: Array[Long], vecs: Array[Float], dim: Int)

  /** Memoized through [[ServingCache]]: resident until the LRU byte
    * budget evicts it (keyed by caller key + columns so nothing aliases);
    * a rebuilt instance after eviction returns identical results.
    */
  def buildCached(df: DataFrame, cacheKey: String, idCol: String,
      embCol: String): PackedScan =
    ServingCache.getOrBuild(s"packed#$cacheKey#$idCol#$embCol") {
      val ps = build(df, idCol, embCol)
      (ps, ps.bytes, () => ps.unpersist())
    }

  /** Pack (one pass over the source) and pin MEMORY_ONLY. */
  def build(df: DataFrame, idCol: String, embCol: String): PackedScan = {
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
    val blocks = src.rdd.mapPartitions { it =>
      val ids = Array.newBuilder[Long]
      var vecs = new Array[Float](0)
      var used = 0
      var dim = -1
      it.foreach { case (id, v) =>
        if (dim < 0) dim = v.length
        require(v.length == dim, s"ragged vector: ${v.length} != $dim")
        if (used + dim > vecs.length) {
          val grown = new Array[Float](math.max(dim * 1024, vecs.length * 2))
          System.arraycopy(vecs, 0, grown, 0, used)
          vecs = grown
        }
        System.arraycopy(v, 0, vecs, used, dim)
        used += dim
        ids += id
      }
      val idArr = ids.result()
      if (idArr.isEmpty) Iterator.empty
      else {
        val tight = new Array[Float](used)
        System.arraycopy(vecs, 0, tight, 0, used)
        Iterator.single(Block(idArr, tight, dim))
      }
    }
    blocks.persist(StorageLevel.MEMORY_ONLY)
    // rows + pinned bytes in ONE materializing job (ids: 8 B, floats: 4 B)
    val (rows, bytes) = blocks
      .map(b => (b.ids.length.toLong, b.ids.length.toLong * 8 + b.vecs.length.toLong * 4))
      .fold((0L, 0L)) { case ((r1, s1), (r2, s2)) => (r1 + r2, s1 + s2) }
    val dim = blocks.take(1).headOption.map(_.dim).getOrElse(0)
    new PackedScan(blocks, dim, rows, bytes)
  }
}
