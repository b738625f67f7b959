package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashEmbedder

/** Deterministic PLANTED-CLUSTER embedding corpus for recall gates.
  *
  * The driver's `embeddings` table is uniform-random, which is the
  * degenerate worst case for any clustering index: nearest neighbors are
  * spread evenly, so IVF recall cannot exceed the probed fraction
  * (BENCH ann_curve documents that ceiling honestly). Real embedding
  * corpora are strongly clustered — BASELINE.md's ANN budget ("≥10× scan
  * reduction at recall ≥ 0.95") is stated for clustered data, and this
  * generator provides it reproducibly:
  *
  *   point_i = normalize(center(i mod C) + eps * u_i)
  *
  * with unit centers built from 8 hash-embedder tokens (dense enough that
  * inter-center cosines concentrate near 0) and per-point noise u_i from
  * the row's id. eps = 0.25 puts same-cluster cosines ≥ ~0.88 and
  * cross-cluster ≤ ~0.45 — separated clusters, overlapping enough that
  * k-means still has to find them. Everything derives from
  * [[HashEmbedder]], so corpora are identical across JVMs and sessions,
  * and generation is a pure map over `spark.range` (no data movement,
  * scales to any n).
  */
object ClusteredCorpus {

  val DefaultEps = 0.25

  /** Unit center vectors, dense-ish (8 tokens → up to 32 active coords). */
  def centers(nClusters: Int, dim: Int = HashEmbedder.DefaultDim): Array[Array[Float]] =
    Array.tabulate(nClusters) { j =>
      HashEmbedder.embed((0 until 8).map(t => s"center-$j-tok$t").mkString(" "), dim)
    }

  /** A query near center `t` (same construction as the data points, with
    * its own noise token — so its true neighbors are cluster t's points).
    */
  def query(t: Int, dim: Int = HashEmbedder.DefaultDim, eps: Double = DefaultEps): Array[Float] = {
    val c = centers(t + 1, dim)(t)
    val u = HashEmbedder.embed(s"probe-$t", dim)
    val raw = Array.tabulate(dim)(i => c(i) + eps.toFloat * u(i))
    val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  /** The corpus: (vec_id, true_cluster, embedding), distributed map-only
    * generation. `true_cluster` is the planted label (ground truth for
    * diagnostics — the index never sees it).
    */
  def df(spark: SparkSession, n: Long, nClusters: Int,
      dim: Int = HashEmbedder.DefaultDim, eps: Double = DefaultEps): DataFrame = {
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    val cents = centers(nClusters, dim)
    val centLit = array(cents.map(c => array(c.map(x => lit(x)): _*)): _*)
    val noise = toColumn(org.apache.spark.sql.graft.NeuralArray(
      toExpr(concat(lit("pt-"), col("vec_id"))), dim))
    // __raw / __nrm are materialized as their own projection columns, and
    // downstream expressions reference the ATTRIBUTES — never the same
    // Column tree twice (shared NamedLambdaVariable state in interpreted
    // HOFs, see round-1 notes)
    spark.range(n)
      .select(col("id").as("vec_id"),
        (col("id") % nClusters).cast("int").as("true_cluster"))
      .withColumn("__raw", zip_with(
        element_at(centLit, (col("vec_id") % nClusters).cast("int") + 1),
        noise,
        (c, u) => c + lit(eps) * u))
      .withColumn("__nrm",
        sqrt(aggregate(col("__raw"), lit(0.0d), (s, x) => s + x * x)))
      .select(col("vec_id"), col("true_cluster"),
        transform(col("__raw"), x => (x / col("__nrm")).cast("float")).as("embedding"))
  }
}
