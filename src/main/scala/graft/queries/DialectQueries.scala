package graft.queries

import graft.Tables

/** Remaining §2.8 dialect functions exercised through the SQL surface:
  * arrayJoin (Generator), toJSONString/JSONExtractString (Object('JSON')
  * round-trip), the custom vector_avg aggregate, and the ANN optimizer
  * rewrite end-to-end through SQL text.
  */
object DialectQueries {

  private val annQueryText = "distributed vector search engine"

  val defs: Seq[QueryDef] = Seq(

    // ---- ANN short-circuit through plain Vector-SQL text ---------------
    // The same query as q22 but over an IVF-indexed view with
    // spark.graft.ann.enabled: AnnTopKRule injects the cluster prune, so
    // the scan touches nprobe/k of the table (approximate -> rows-only;
    // exactness vs recall asserted in OperatorSpec).
    QueryDef("q72_ann_sql_rewrite", (s, dir) => {
      val (_, indexed) = graft.operators.AnnIndex.fitCached(
        graft.Tables.embeddings(s, dir), dir, "embedding", "vec_id", k = 16, iters = 3)
      indexed.createOrReplaceTempView("indexed_embeddings")
      s.conf.set("spark.graft.ann.enabled", "true")
      // explicit: q105 (the full-probe exact twin) sets nprobe=16 on the
      // same session conf; this query must not inherit it
      s.conf.set("spark.graft.ann.nprobe", "4")
      s.sql(s"""
        SELECT vec_id, label,
               round(distance(embedding, NeuralArray('$annQueryText')), 6) AS dist
        FROM indexed_embeddings
        ORDER BY distance(embedding, NeuralArray('$annQueryText')), vec_id
        LIMIT 10""")
    }, None),

    // ---- arrayJoin = explode as a dialect function ---------------------
    // (`SELECT arrayJoin(file_names) FROM (...)`,
    //  reference private_knowledge_base.py:145-151)
    QueryDef("q69_arrayjoin_wordcount", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT w AS word, count(*) AS n
        FROM (SELECT arrayJoin(split(text, ' ')) AS w FROM documents) t
        WHERE w <> ''
        GROUP BY w ORDER BY n DESC, word LIMIT 20""")
    }, Some("""
      SELECT w AS word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      WHERE w <> ''
      GROUP BY w ORDER BY n DESC, word LIMIT 20""")),

    // ---- toJSONString / JSONExtractString round-trip -------------------
    // (docs/vector-sql.md:204-209 metadata JSON handling)
    QueryDef("q70_json_roundtrip", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT lang,
               toJSONString(named_struct('lang', lang, 'n', count(*))) AS j,
               JSONExtractString(toJSONString(named_struct('lang', lang)), 'lang') AS rt
        FROM documents GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang,
             CAST(to_json(struct_pack(lang := lang, n := count(*))) AS VARCHAR) AS j,
             json_extract_string(CAST(to_json(struct_pack(lang := lang)) AS VARCHAR), '$.lang') AS rt
      FROM documents GROUP BY lang ORDER BY lang""")),

    // ---- custom UDAF through SQL: vector_avg ---------------------------
    QueryDef("q71_vector_avg", (s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
      s.sql("""
        SELECT label,
               round(vector_avg(embedding)[0], 6) AS d0,
               round(vector_avg(embedding)[1], 6) AS d1,
               round(vector_avg(embedding)[2], 6) AS d2,
               count(*) AS n
        FROM embeddings GROUP BY label ORDER BY label""")
    }, Some("""
      SELECT label,
             round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS d0,
             round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS d1,
             round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS d2,
             count(*) AS n
      FROM embeddings GROUP BY label ORDER BY label"""))
  )
}
