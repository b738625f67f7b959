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

  /** Memoized encoded table + its row count (the offline index build, as
    * [[PqIndex.encodedCached]]); registered with [[ServingCache]] so the
    * LRU byte budget governs residency (evict = unpersist + rebuild).
    */
  def encodedCached(df: DataFrame, cacheKey: String, model: Model,
      embCol: String): (DataFrame, Long) =
    ServingCache.getOrBuild(s"sq8#$cacheKey") {
      val enc = df.withColumn("__sq", encode(model, col(embCol))).cache()
      val n = enc.count()
      val dim = model.mins.length.toLong
      // cached row ≈ source floats + dim code bytes + row overhead
      ((enc, n), n * (dim * 5 + 64), () => { enc.unpersist(); () })
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
