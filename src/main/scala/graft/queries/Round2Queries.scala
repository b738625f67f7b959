package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder
import org.apache.spark.sql.graft.PackedVectorFunctions._

/** Round-2 battery: packed vector storage (the reference's `fp16_storage=1`
  * MSTG option, `app/backend/constants/myscale_tables.py:35,63`) surfaced as
  * verifiable queries.
  *
  * q91 proves the fp32-packed scan is LOSSLESS: identical top-k + distances
  * to the array-column scan (oracle = same SQL as q20). q92 proves the fp16
  * round-trip stays inside half-precision's error budget on every stored
  * vector (elements are < 0.5, so abs error <= 2^-12; the 1e-3 gate has 4x
  * headroom) — the oracle pins n_bad to zero.
  */
object Round2Queries {

  private val qText = "distributed vector search engine"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q91_knn_packed", (s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), vec_pack(col("embedding")).as("emb"))
        .withColumn("dist", cosine_distance_packed(col("emb"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    QueryDef("q92_f16_quality", (s, dir) => {
      val rt = vec_unpack_f16(vec_pack_f16(col("embedding")))
      Tables.embeddings(s, dir)
        .select(array_max(zip_with(col("embedding"), rt,
          (a, b) => abs(a - b))).as("err"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("err") > 0.001, 1L).otherwise(0L)).as("n_bad"))
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_vectors, CAST(0 AS BIGINT) AS n_bad
      FROM embeddings"""))
  )
}
