package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization trainer + API (see
  * [[org.apache.spark.sql.graft.Sq8Expressions]]): per-dimension [min,max]
  * bounds from ONE aggregation job (a zip_with min/max fold — k*dim
  * aggregate state, no collect of vectors), then encode/scan are pure
  * codegen expressions. The 1 B/dim rung of the storage ladder between
  * fp16 (lossless-ish) and PQ (1 B per 8 dims).
  */
object Sq8Index {

  final case class Model(mins: Array[Float], scales: Array[Float])

  private val models = new scala.collection.concurrent.TrieMap[String, Model]

  /** Content identity of a trained model: two callers reusing a cacheKey
    * string with different bounds (or a different column) must not alias
    * a stale encoded table — same contract as [[PqIndex.encodedCached]].
    */
  private def modelId(model: Model): String =
    ((java.util.Arrays.hashCode(model.mins).toLong << 32) ^
      (java.util.Arrays.hashCode(model.scales).toLong & 0xffffffffL)).toHexString

  /** Memoized encoded table + its row count (the offline index build, as
    * [[PqIndex.encodedCached]]); registered with [[ServingCache]] so the
    * LRU byte budget governs residency (evict = unpersist + rebuild).
    */
  def encodedCached(df: DataFrame, cacheKey: String, model: Model,
      embCol: String): (DataFrame, Long) =
    ServingCache.getOrBuild(s"sq8#$cacheKey#$embCol#${modelId(model)}") {
      val enc = df.withColumn("__sq", encode(model, col(embCol))).cache()
      val n = enc.count()
      val dim = model.mins.length.toLong
      // actual pinned size from the materialized InMemoryRelation (the
      // cached plan carries ALL source columns); heuristic = fallback
      val bytes = ServingCache.cachedBytes(enc, n * (dim * 5 + 64))
      ((enc, n), bytes, () => { enc.unpersist(); () })
    }

  /** Per-dimension bounds: posexplode + hash agg keyed by dim — partial
    * min/max combine map-side, so the shuffle is dim rows per partition
    * regardless of table size (the scale-correct way to fit SQ bounds).
    */
  def fitCached(df: DataFrame, cacheKey: String, embCol: String): Model =
    models.getOrElseUpdate(cacheKey, {
      val perDim = df
        .select(posexplode(col(embCol)).as(Seq("dim", "x")))
        .groupBy("dim")
        .agg(min("x").as("mn"), max("x").as("mx"))
        .orderBy("dim")
        .collect()
      val mins = perDim.map(_.getFloat(1))
      val maxs = perDim.map(_.getFloat(2))
      val scales = mins.indices.map(i => (maxs(i) - mins(i)) / 255f).toArray
      Model(mins, scales)
    })

  /** DURABLE FORM (see [[PqIndex.save]] — same `disk_mode=3` analog):
    * per-dim bounds + the encoded table persisted as parquet; a new
    * session serves without re-fitting or re-encoding. Bounds round-trip
    * bit-exactly (floats stored as-is), so the loaded model's codegen
    * constants — and therefore every distance — are identical
    * (spec-gated round trip in PqSpec).
    */
  def save(model: Model, encoded: DataFrame, path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    // bounds + codes commit as ONE epoch under a pointer flip
    // (EpochStore) — same re-save crash posture as PqIndex.save
    EpochStore.commit(FsOps(spark), path) { dir =>
      model.mins.indices.map(i => (i, model.mins(i), model.scales(i))).toDF(
        "dim", "mn", "scale")
        .coalesce(1) // dim rows, bounded by construction
        .write.mode("overwrite").parquet(s"$dir/bounds")
      encoded.write.mode("overwrite").parquet(s"$dir/codes")
    }
    ()
  }

  /** Reload a [[save]]d index: (model, encoded table, row count). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String)
      : (Model, DataFrame, Long) = {
    import spark.implicits._
    val fsOps = FsOps(spark)
    val dir = EpochStore.resolve(fsOps, path)
    // FastRead: no plan-time schema-inference job per sub-dir
    val rows = FastRead.dir(spark, fsOps, s"$dir/bounds")
      .select(col("dim").cast("int"), col("mn"), col("scale"))
      .as[(Int, Float, Float)].collect().sortBy(_._1)
    val enc = FastRead.dir(spark, fsOps, s"$dir/codes")
    (Model(rows.map(_._2), rows.map(_._3)), enc, enc.count())
  }

  def encode(model: Model, vec: Column): Column = {
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    toColumn(org.apache.spark.sql.graft.Sq8Encode(toExpr(vec), model.mins, model.scales))
  }

  def distance(model: Model, code: Column, query: Column): Column = {
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    toColumn(org.apache.spark.sql.graft.CosineDistanceSq8(
      toExpr(code), toExpr(query), model.mins, model.scales))
  }
}
