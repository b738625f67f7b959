package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions

import graft.functions.HashEmbedder

/** The retrieval facade — Spark-native equivalent of the reference's
  * `MyScaleWithoutMetadataJson.similarity_search_by_vector`
  * (`app/backend/vector_store/myscale_without_metadata.py:20-48`):
  *
  *   SELECT text_col, dist, must_have_cols FROM table
  *   PREWHERE where_str
  *   ORDER BY distance(vec_col, [q]) AS dist ASC LIMIT k
  *
  * Mapping (SURVEY.md §2.6 T1, §2.2 P1/P3):
  *   - PREWHERE        → `.filter` before the distance projection; Catalyst
  *     pushes it into the parquet scan (PushedFilters), so non-matching
  *     row groups never materialize the vector column.
  *   - ORDER BY+LIMIT  → Spark plans `TakeOrderedAndProject`: each
  *     partition keeps only its local top-k, the driver merges k×P rows —
  *     a scatter-gather identical in shape to a distributed ANN query. No
  *     global sort, no shuffle of the full table, at any scale.
  *   - dist tie-break  → `(dist, idCols)` so results are deterministic
  *     (the reference orders by dist alone; ties there are
  *     engine-ordered — SURVEY §7 "what's hard").
  */
final case class VectorStore(
    df: DataFrame,
    embCol: String,
    idCols: Seq[String],
    dim: Int = HashEmbedder.DefaultDim) {

  /** k-NN by raw vector; `filter` is the compiled self-query predicate. */
  def searchByVector(
      q: Array[Float],
      k: Int,
      filter: Option[Column] = None,
      select: Seq[String] = Nil): DataFrame = {
    val base = filter.map(df.filter).getOrElse(df)
    val qLit = typedlit[Seq[Float]](q.toIndexedSeq)
    val scored = base.withColumn("dist",
      VectorFunctions.cosine_distance(col(embCol), qLit))
    val ordered = scored.orderBy(col("dist") +: idCols.map(col): _*).limit(k)
    if (select.isEmpty) ordered
    else ordered.select(select.map(col) :+ col("dist"): _*)
  }

  /** k-NN by query text via the deterministic embedder (the reference's
    * `NeuralArray(entity)` substitution path, EP1 step 3).
    */
  def search(
      queryText: String,
      k: Int,
      filter: Option[SelfQueryFilter.Node] = None,
      select: Seq[String] = Nil): DataFrame =
    searchByVector(
      HashEmbedder.embed(queryText, dim), k,
      filter.map(SelfQueryFilter.compile), select)
}
