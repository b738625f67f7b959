package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.HashEmbedder
import graft.operators.{SelfQueryFilter => F, VectorStore}
import org.apache.spark.sql.graft.VectorFunctions._

/** Vector-search battery — the heart of the engine (SURVEY.md §2.6).
  *
  * T1: exact cosine top-k (`ORDER BY distance(vec,[q]) AS dist LIMIT k`,
  * reference `app/backend/vector_store/myscale_without_metadata.py:28-36`).
  * T2: the same through SQL text with `DISTANCE` + `NeuralArray`
  * (`app/backend/constants/prompts.py:31-36`, `docs/vector-sql.md:77-93`).
  * P3/P5: PREWHERE-style filtered k-NN with the self-query AST.
  *
  * Oracle parity notes: distances are ordered on the EXACT double value
  * (ties broken by vec_id) but *output* rounded to 6 dp, since Spark and
  * DuckDB disagree in the last couple of ulps (different accumulation
  * formulas); 6 dp is ~1e9 ulps of headroom. Query vectors are inlined
  * into the oracle text via their exact decimal expansions
  * ([[HashEmbedder.sqlArrayLiteral]]).
  */
object VectorQueries {

  private val qText = "distributed vector search engine"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  private def store(s: org.apache.spark.sql.SparkSession, dir: String) =
    VectorStore(Tables.embeddings(s, dir), "embedding", Seq("vec_id"))

  val defs: Seq[QueryDef] = Seq(

    // ---- T1: exact cosine top-k over the full table --------------------
    QueryDef("q20_knn_exact", (s, dir) => {
      store(s, dir).searchByVector(qVec, 10)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- P3+P5: PREWHERE-style filtered k-NN (self-query AST) ----------
    QueryDef("q21_knn_filtered", (s, dir) => {
      val filter = F.And.of(
        F.In("label", Seq(F.I(1), F.I(3), F.I(5), F.I(7))),
        F.Lt("vec_id", F.I(400)))
      store(s, dir).searchByVector(qVec, 10, Some(F.compile(filter)))
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE ((label IN (1, 3, 5, 7)) AND (vec_id < 400))
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- T2: the Vector-SQL text surface (DISTANCE + NeuralArray) ------
    QueryDef("q22_vector_sql", (s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
      s.sql(s"""
        SELECT vec_id, label,
               round(distance(embedding, NeuralArray('$qText')), 6) AS dist
        FROM embeddings
        WHERE label <> 0
        ORDER BY distance(embedding, NeuralArray('$qText')), vec_id
        LIMIT 10""")
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE label <> 0
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- L2 metric -----------------------------------------------------
    QueryDef("q23_l2_topk", (s, dir) => {
      Tables.embeddings(s, dir)
        .withColumn("d", l2_distance(col("embedding"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("d"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("d"), 6).as("d"))
    }, Some(s"""
      SELECT vec_id,
        round(list_distance(CAST(embedding AS DOUBLE[]), CAST($qLit AS DOUBLE[])), 6) AS d
      FROM embeddings
      ORDER BY list_distance(CAST(embedding AS DOUBLE[]), CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- inner-product metric (descending = most similar) --------------
    QueryDef("q24_ip_topk", (s, dir) => {
      Tables.embeddings(s, dir)
        .withColumn("ip", inner_product(col("embedding"), typedlit(qVec.toIndexedSeq)))
        .orderBy(desc("ip"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("ip"), 6).as("ip"))
    }, Some(s"""
      SELECT vec_id,
        round(list_inner_product(CAST(embedding AS DOUBLE[]), CAST($qLit AS DOUBLE[])), 6) AS ip
      FROM embeddings
      ORDER BY list_inner_product(CAST(embedding AS DOUBLE[]), CAST($qLit AS DOUBLE[])) DESC, vec_id
      LIMIT 10""")),

    // ---- top-k per group: rank window over the distance ----------------
    QueryDef("q25_knn_per_label", (s, dir) => {
      val w = Window.partitionBy(col("label"))
        .orderBy(col("dist_exact"), col("vec_id"))
      Tables.embeddings(s, dir)
        .withColumn("dist_exact",
          cosine_distance(col("embedding"), typedlit(qVec.toIndexedSeq)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("label"), col("rn"), col("vec_id"),
          round(col("dist_exact"), 6).as("dist"))
        .orderBy("label", "rn")
    }, Some(s"""
      SELECT label, rn, vec_id, round(de, 6) AS dist FROM (
        SELECT label, vec_id,
          1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST($qLit AS DOUBLE[])) AS de,
          row_number() OVER (PARTITION BY label ORDER BY
            1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST($qLit AS DOUBLE[])), vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 3 ORDER BY label, rn""")),

    // ---- P1: retriever facade with must-have column selection ----------
    // (retrieval always returns text_col + dist + must_have_cols,
    //  myscale_without_metadata.py:29; the select list is narrowed but
    //  dist is always appended)
    QueryDef("q27_retriever_select", (s, dir) => {
      store(s, dir)
        .searchByVector(qVec, 8,
          Some(F.compile(F.Gte("label", F.I(2)))),
          select = Seq("vec_id", "label"))
        .withColumn("dist", round(col("dist"), 6))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE label >= 2
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 8""")),

    // ---- P5: self-query filter AST alone (documents) -------------------
    QueryDef("q26_selfquery_documents", (s, dir) => {
      val filter = F.Or.of(
        F.And.of(F.Eq("lang", F.S("en")), F.Gt("n_chars", F.I(300))),
        F.And.of(F.Like("text", "%vector%"), F.Ne("lang", F.S("zh"))))
      Tables.documents(s, dir)
        .filter(F.compile(filter))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id, lang, n_chars FROM documents
      WHERE ${F.toSql(F.Or.of(
        F.And.of(F.Eq("lang", F.S("en")), F.Gt("n_chars", F.I(300))),
        F.And.of(F.Like("text", "%vector%"), F.Ne("lang", F.S("zh")))))}
      ORDER BY doc_id"""))
  )
}
