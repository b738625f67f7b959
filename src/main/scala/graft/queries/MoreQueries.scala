package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Catalog, Ingest}

/** Ingest, catalog lifecycle, citation join, dialect combo, and the
  * remaining window/join surface (SURVEY.md §2.1 S4-S9, §2.3 J4,
  * §2.6 T5, §2.8).
  */
object MoreQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- S4+P9+sha-id: parse→chunk→filter→id ingest front half ---------
    QueryDef("q62_ingest_chunks", (s, dir) => {
      val chunks = Ingest.chunk(Tables.documents(s, dir), "doc_id", "source", "text")
      Ingest.narrativeFilter(chunks)
        .withColumn("entity_id", Ingest.withEntityId(chunks, "source", "chunk_text"))
        .withColumn("n_words", size(split(col("chunk_text"), " ")).cast("long"))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("n_words"), col("entity_id"))
        .orderBy("doc_id", "chunk_idx")
    }, Some("""
      WITH d AS (
        SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      c0 AS (
        SELECT doc_id, source, t,
               unnest(range(0, (len(t) + 14) // 15)) AS i
        FROM d),
      c AS (
        SELECT doc_id, source, i AS chunk_idx,
               array_to_string(t[(i*15+1):((i+1)*15)], ' ') AS chunk_text
        FROM c0)
      SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_words,
             sha256(source || '#' || chunk_text) AS entity_id
      FROM c
      WHERE len(string_split(chunk_text, ' ')) > 10
      ORDER BY doc_id, chunk_idx""")),

    // ---- S5/S6/S8/S9 + W1: create/append/upsert-read/delete lifecycle --
    QueryDef("q63_upsert_delete", (s, dir) => {
      // fixed path (create() overwrites): bounded disk across driver rounds
      val root = graft.operators.AnnIndex.tmpRoot + "/catalog_q63"
      val cat = Catalog(s, root)
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), lit(1).as("version"))
      cat.create("kb", docs)
      // upsert: re-ingest English docs as version 2 with edited text
      cat.append("kb", docs.filter(col("lang") === "en")
        .withColumn("version", lit(2))
        .withColumn("text", concat(col("text"), lit(" v2"))))
      // delete-by-predicate (anti-join rewrite)
      cat.deleteWhere("kb", col("lang") === "zh")
      cat.read("kb", Seq("doc_id"), "version")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("version") === 2, 1).otherwise(0)).cast("long").as("n_v2"))
        .orderBy("lang")
    }, Some("""
      SELECT lang, count(*) AS n,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_v2
      FROM documents WHERE lang <> 'zh'
      GROUP BY lang ORDER BY lang""")),

    // ---- J4+T5: Doc #i citation extraction + mention-order join --------
    // (reference post-processes answers: `Doc #i` -> source join in
    //  mention order, retrieval_qa_with_sources.py:21-59)
    QueryDef("q64_citation_join", (s, dir) => {
      val w = Window.orderBy(desc("n_chars"), col("doc_id"))
      val refs = Tables.documents(s, dir)
        .withColumn("ref_id", row_number().over(w) - 1)
        .select(col("ref_id"), col("doc_id"), col("lang"))
      val answers = Tables.documents(s, dir)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("answer_id"),
          concat(lit("see Doc #"), (col("doc_id") % 50).cast("string"),
            lit(" and Doc #"), ((col("doc_id") * 3) % 50).cast("string")).as("answer"))
      val mentions = answers
        .select(col("answer_id"),
          posexplode(regexp_extract_all(col("answer"), lit("Doc #(\\d+)"), lit(1)))
            .as(Seq("mention_pos", "ref_str")))
        .withColumn("ref_id", col("ref_str").cast("int"))
      mentions.join(refs, "ref_id")
        .select(col("answer_id"), col("mention_pos").cast("long").as("mention_pos"),
          col("ref_id"), col("doc_id"), col("lang"))
        .orderBy("answer_id", "mention_pos")
    }, Some("""
      WITH refs AS (
        SELECT row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS ref_id,
               doc_id, lang
        FROM documents),
      answers AS (
        SELECT doc_id AS answer_id,
               'see Doc #' || CAST(doc_id % 50 AS VARCHAR) ||
               ' and Doc #' || CAST((doc_id * 3) % 50 AS VARCHAR) AS answer
        FROM documents WHERE doc_id % 7 = 0),
      m0 AS (
        SELECT answer_id,
               unnest(regexp_extract_all(answer, 'Doc #(\d+)', 1)) AS ref_str,
               generate_subscripts(regexp_extract_all(answer, 'Doc #(\d+)', 1), 1) - 1 AS mention_pos
        FROM answers)
      SELECT answer_id, CAST(mention_pos AS BIGINT) AS mention_pos,
             CAST(ref_str AS INT) AS ref_id, refs.doc_id, refs.lang
      FROM m0 JOIN refs ON CAST(ref_str AS INT) = refs.ref_id
      ORDER BY answer_id, mention_pos""")),

    // ---- P6 + §2.8: dialect combo through the SQL surface --------------
    QueryDef("q65_dialect_combo", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT doc_id,
               length(text) AS n_chars2,
               has(split(text, ' '), 'vector') AS has_vector,
               CASE WHEN lang ILIKE 'E%' THEN 1 ELSE 0 END AS lang_e,
               trim(BOTH '"' FROM concat('"', lang, '"')) AS lang_trim
        FROM documents
        WHERE parseDateTimeBestEffort('2021-06-01') > parseDateTimeBestEffort('2021-01-01')
          AND today() >= DATE '2020-01-01'
        ORDER BY doc_id""")
    }, Some("""
      SELECT doc_id,
             CAST(length(text) AS INT) AS n_chars2,
             list_contains(string_split(text, ' '), 'vector') AS has_vector,
             CASE WHEN lang ILIKE 'E%' THEN 1 ELSE 0 END AS lang_e,
             trim('"' || lang || '"', '"') AS lang_trim
      FROM documents
      WHERE TIMESTAMP '2021-06-01' > TIMESTAMP '2021-01-01'
        AND today() >= DATE '2020-01-01'
      ORDER BY doc_id""")),

    // ---- approx distinct (HLL++) ---------------------------------------
    // Sketch VALUES are engine-specific, so the gate pins the INVARIANT
    // instead: the exact count (which DuckDB reproduces) plus a boolean
    // that the HLL estimate landed within 3x its configured rsd (0.05 ->
    // 15% bound; the estimate is deterministic for fixed data, measured
    // well inside the bound at sf0.01 and sf0.1).
    QueryDef("q66_approx_distinct", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.15).as("within_bound"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS exact_parts,
             TRUE AS within_bound
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- remaining analytic window functions ---------------------------
    QueryDef("q67_window_funcs", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 100)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .select("o_custkey", "o_orderkey", "o_totalprice",
          "rnk", "drnk", "prev_price", "next_price", "quartile")
        .orderBy("o_custkey", "rnk", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        rank() OVER w AS rnk,
        dense_rank() OVER w AS drnk,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        ntile(4) OVER w AS quartile
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_custkey, rnk, o_orderkey""")),

    // ---- outer joins ----------------------------------------------------
    QueryDef("q68_outer_joins", (s, dir) => {
      val custByNation = Tables.customer(s, dir)
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val suppByNation = Tables.supplier(s, dir)
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
      custByNation.join(suppByNation, Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    }, Some("""
      SELECT coalesce(c.nk, su.nk) AS nk,
             coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN
           (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) su
      ON c.nk = su.nk
      ORDER BY nk"""))
  )
}
