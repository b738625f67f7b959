package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", PAMI'11 — public method): split a D-d vector
  * into M subvectors, k-means each subspace to K=256 centroids, store one
  * byte per subvector. D=64 floats (256 B) become M=8 bytes — 32x
  * compression, and ADC (asymmetric distance computation) scans the codes
  * with one table lookup per byte.
  *
  * Role here: the quantized counterpart of the reference's MSTG index
  * internals (MSTG is proprietary; its DDL exposes only `fp16_storage`,
  * which [[org.apache.spark.sql.graft.VecPackF16]] covers — PQ is the
  * standard public next step down the memory/recall trade).
  *
  * Scale design: codebooks train DRIVER-SIDE on a deterministic sample
  * (PQ codebooks are universally sample-trained; 256 centroids x 8 dims
  * x 8 subspaces is KBs), then encode/scan are pure codegen expressions —
  * no shuffle, no UDF. A 100 TB vector corpus becomes ~3 TB of codes that
  * scan at memory bandwidth; the exact re-rank touches only the ADC
  * top-C.
  */
object PqIndex {

  /** codebooks(m)(k) = centroid k of subspace m (dsub floats each). */
  final case class Model(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length

    /** Flattened [m * k * dsub] for codegen reference objects. */
    def flat: Array[Float] = {
      val out = new Array[Float](m * k * dsub)
      var i = 0
      for (mm <- 0 until m; kk <- 0 until k; dd <- 0 until dsub) {
        out(i) = codebooks(mm)(kk)(dd); i += 1
      }
      out
    }
  }

  /** Trained models are KB-scale and stay in a plain memo; ENCODED
    * TABLES pin executor memory and are registered with [[ServingCache]]
    * (LRU byte budget, evict = unpersist, rebuild on next use). Keys fold
    * in every identity the cached value depends on (caller key +
    * embedding column + model content hash / train parameters), so two
    * callers reusing a key string with a different model or column can
    * never alias a stale entry.
    */
  private val models =
    new scala.collection.concurrent.TrieMap[String, Model]

  /** Content identity of a trained model (codebooks are KBs; hashing them
    * is cheap next to any Spark job the memo guards).
    */
  private def modelId(model: Model): String =
    (java.util.Arrays.hashCode(model.flat).toLong & 0xffffffffL).toString

  /** Content identity of the IVF model a residual codec is trained against. */
  private def annId(ann: AnnIndex.Model): String =
    (java.util.Arrays.deepHashCode(
      ann.centroids.asInstanceOf[Array[AnyRef]]).toLong & 0xffffffffL).toString

  /** Memoized encoded table (id, label?, embedding, __code), cached — the
    * encode pass is the offline index build; at scale it would persist
    * next to the vectors like the IVF assignment column.
    */
  def encodedCached(df: DataFrame, cacheKey: String, model: Model,
      embCol: String): DataFrame =
    ServingCache.getOrBuild(s"pq#$cacheKey#$embCol#${modelId(model)}") {
      val enc = df.withColumn("__code", encode(model, col(embCol))).cache()
      val n = enc.count()
      // `enc` caches ALL source columns, not just embedding + code — read
      // the ACTUAL pinned size from the materialized InMemoryRelation so
      // wide payload columns (document text) can't silently blow the LRU
      // budget; the schema heuristic is only the fallback
      val bytes = ServingCache.cachedBytes(
        enc, n * (model.m.toLong * model.dsub * 4 + model.m + 64))
      (enc, bytes, () => { enc.unpersist(); () })
    }

  /** Train per-subspace k-means (Lloyd's, driver-side) on a deterministic
    * sample: the `sampleN` lowest-id vectors. Deterministic init = first
    * K sample points per subspace; empty clusters keep their previous
    * centroid. Memoized per cacheKey.
    */
  def fitCached(df: DataFrame, cacheKey: String, embCol: String, idCol: String,
      m: Int = 8, k: Int = 256, iters: Int = 5, sampleN: Int = 2000): Model =
    models.getOrElseUpdate(s"$cacheKey#$embCol#$idCol#$m#$k#$iters#$sampleN", {
      val sample = df.orderBy(col(idCol)).limit(sampleN)
        .select(embCol).collect()
        .map(_.getSeq[Float](0).toArray)
      trainOn(sample, m, k, iters)
    })

  /** Lloyd's per subspace over an in-driver sample (shared by the raw and
    * residual trainers).
    */
  private def trainOn(sample: Array[Array[Float]], m: Int, k: Int, iters: Int): Model = {
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val kEff = math.min(k, sample.length)
    val codebooks = Array.tabulate(m) { mm =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, mm * dsub, (mm + 1) * dsub))
      var cents = Array.tabulate(kEff)(i => subs(i).clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(kEff, dsub)(0.0)
        val counts = new Array[Long](kEff)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < kEff) {
            var acc = 0.0; var j = 0
            while (j < dsub) { val t = s(j) - cents(c)(j); acc += t * t; j += 1 }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          var j = 0
          while (j < dsub) { sums(best)(j) += s(j); j += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(kEff) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(j => (sums(c)(j) / counts(c)).toFloat)
        }
      }
      cents
    }
    Model(codebooks)
  }

  /** Encode an embedding column to PQ codes (binary, m bytes). */
  def encode(model: Model, vec: Column): Column = {
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    toColumn(org.apache.spark.sql.graft.PqEncode(
      toExpr(vec), model.flat, model.m, model.k, model.dsub))
  }

  /** ADC squared-L2 distance from a fixed query to a code column. */
  def adcDistance(model: Model, code: Column, query: Array[Float]): Column = {
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    toColumn(org.apache.spark.sql.graft.PqAdcDistance(
      toExpr(code), model.flat, model.m, model.k, model.dsub, query))
  }

  /** Residual IVF-PQ (PAMI'11 §IV): codebooks trained on v - centroid of
    * v's IVF cluster — residuals are smaller and better-centered than raw
    * vectors, so the same 8 bytes quantize them more finely. The residual
    * column is built with plain zip_with against the broadcast centroid
    * literal; encode reuses [[org.apache.spark.sql.graft.PqEncode]].
    */
  def fitResidualCached(indexed: DataFrame, cacheKey: String, embCol: String,
      idCol: String, ann: AnnIndex.Model,
      m: Int = 8, k: Int = 256, iters: Int = 5, sampleN: Int = 2000): Model =
    models.getOrElseUpdate(
      s"$cacheKey#$embCol#$idCol#$m#$k#$iters#$sampleN#residual#${annId(ann)}", {
      val sample = indexed.orderBy(col(idCol)).limit(sampleN)
        .select(col(embCol), col("cluster_id")).collect()
        .map { r =>
          val v = r.getSeq[Float](0).toArray
          val c = ann.centroids(r.getInt(1))
          v.indices.map(i => (v(i) - c(i).toFloat)).toArray
        }
      trainOn(sample, m, k, iters)
    })

  /** Memoized residual-encoded table over an IVF-indexed input. */
  def encodedResidualCached(indexed: DataFrame, cacheKey: String, model: Model,
      ann: AnnIndex.Model, embCol: String): DataFrame =
    ServingCache.getOrBuild(
      s"pq#$cacheKey#$embCol#${modelId(model)}#residual#${annId(ann)}") {
      val enc = indexed.withColumn("__code",
        encode(model, residualCol(ann, col(embCol), col("cluster_id")))).cache()
      val n = enc.count()
      // same actual-pinned-bytes accounting as encodedCached: the cached
      // plan pins ALL source columns, so the schema heuristic undercounts
      val bytes = ServingCache.cachedBytes(
        enc, n * (model.m.toLong * model.dsub * 4 + model.m + 64))
      (enc, bytes, () => { enc.unpersist(); () })
    }

  /** Column of per-row residuals (v - centroid[cluster_id]). */
  def residualCol(ann: AnnIndex.Model, vec: Column, clusterId: Column): Column = {
    val centLit = array(ann.centroids.map(c =>
      array(c.map(x => lit(x.toFloat)): _*)): _*)
    zip_with(vec, element_at(centLit, clusterId + 1), (a, b) => (a - b).cast("float"))
  }

  /** Residual ADC distance: per-cluster LUTs built from q - centroid_c. */
  def adcResidualDistance(model: Model, ann: AnnIndex.Model,
      code: Column, clusterId: Column, query: Array[Float]): Column = {
    val nClusters = ann.centroids.length
    val luts = new Array[Double](nClusters * model.m * model.k)
    for (c <- 0 until nClusters) {
      val rq = query.indices.map(i => query(i) - ann.centroids(c)(i).toFloat).toArray
      for (mm <- 0 until model.m; kk <- 0 until model.k) {
        var acc = 0.0
        for (j <- 0 until model.dsub) {
          val t = rq(mm * model.dsub + j).toDouble - model.codebooks(mm)(kk)(j).toDouble
          acc += t * t
        }
        luts(c * model.m * model.k + mm * model.k + kk) = acc
      }
    }
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    toColumn(org.apache.spark.sql.graft.PqAdcResidual(
      toExpr(code), toExpr(clusterId), luts, model.m, model.k))
  }

  /** ADC top-`candidates` + exact re-rank to top-`k`: the standard PQ
    * serving pattern — the byte codes absorb the scan, the exact metric
    * touches only the shortlist.
    *
    * Sizing `candidates` (the serving config): on clustered data — i.e.
    * real embedding corpora — a FIXED small C suffices and is independent
    * of corpus size (AnnRecallSpec gates recall@10 >= 0.95 at C = 200 on
    * the planted-cluster corpus; at 100 TB the re-rank stays a constant
    * few hundred rows per query). The C = N/4 scaling in q99/q102/q104 is
    * NOT a serving recommendation: those queries gate EXACTNESS on the
    * uniform-random worst case, where ADC ranks are noisy by construction
    * and the shortlist must grow with N to contain the true top-k with
    * certainty.
    */
  /** DURABLE FORM — the `disk_mode=3` analog of the reference's MSTG DDL
    * (`app/backend/constants/myscale_tables.py:35,63`: a disk-resident
    * index): codebooks + encoded table persisted as parquet, so a new
    * session serves without re-training OR re-encoding. Together with the
    * persisted IVF layout (q93) and the durable cluster graphs (q119),
    * every serving structure in the quantization ladder now survives a
    * restart.
    */
  def save(model: Model, encoded: DataFrame, path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    // codebooks + codes commit as ONE epoch under a pointer flip
    // (EpochStore): a kill mid-save leaves the previous index serving,
    // never codes encoded against codebooks that were not written
    EpochStore.commit(FsOps(spark), path) { dir =>
      model.codebooks.zipWithIndex.flatMap { case (cb, mm) =>
        cb.zipWithIndex.map { case (c, kk) => (mm, kk, c) }
      }.toSeq.toDF("m", "k", "centroid")
        .coalesce(1) // m*k codebook rows, bounded by construction
        .write.mode("overwrite").parquet(s"$dir/codebooks")
      encoded.write.mode("overwrite").parquet(s"$dir/codes")
    }
    ()
  }

  /** Reload a [[save]]d index: (model, encoded table). Codebook content
    * round-trips exactly (floats stored as-is), and the codes table is
    * the one that was saved — [[search]] over the loaded pair returns
    * exactly what the in-session pair returns (q120 hash-gates the whole
    * save/load/serve path at C = N/4, where the shortlist + exact re-rank
    * equals brute force).
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): (Model, DataFrame) = {
    import spark.implicits._
    val fsOps = FsOps(spark)
    val dir = EpochStore.resolve(fsOps, path)
    // FastRead: no plan-time schema-inference job per sub-dir
    val rows = FastRead.dir(spark, fsOps, s"$dir/codebooks")
      .select(col("m").cast("int"), col("k").cast("int"), col("centroid"))
      .as[(Int, Int, Array[Float])].collect()
    val nm = rows.map(_._1).max + 1
    val nk = rows.map(_._2).max + 1
    val cbs = Array.ofDim[Array[Float]](nm, nk)
    rows.foreach { case (mm, kk, c) => cbs(mm)(kk) = c }
    (Model(cbs), FastRead.dir(spark, fsOps, s"$dir/codes"))
  }

  def search(model: Model, encoded: DataFrame, embCol: String, idCol: String,
      query: Array[Float], k: Int, candidates: Int): DataFrame = {
    import org.apache.spark.sql.graft.VectorFunctions.cosine_distance
    val shortlist = encoded
      .withColumn("__adc", adcDistance(model, col("__code"), query))
      .orderBy(col("__adc"), col(idCol))
      .limit(candidates)
    shortlist
      .withColumn("dist", cosine_distance(col(embCol), typedlit(query.toIndexedSeq)))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .drop("__adc", "__code")
  }
}
