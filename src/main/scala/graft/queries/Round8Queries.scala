package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder
import graft.operators.{GraphAnn, PackedScan, SelfQueryFilter, SelfQueryParser}

/** Round-8 battery: the serving fast-path EDGES the r7 verdict ranked —
  * the reference's two most realistic self-query attributes riding the
  * PINNED path.
  *
  * The reference's self-query schema exposes `pubdate` (a timestamp,
  * `docs/self-query.md:196`; the translator renders comparisons via
  * `parseDateTimeBestEffort`, `app/backend/chat_bot/prompts.py:100`) and
  * `authors` (list[string] queried with `contain`,
  * `docs/self-query.md:201`, comparator table at
  * `docs/self-query.md:161-178`). Round 7's [[graft.operators
  * .MetaPredicate]] deliberately excluded both, so "papers by author X
  * after 2021" fell off the pinned serving path to the DataFrame scan —
  * correct (q21/q26/q95 gate that path) but slow at serving rates. Round
  * 8 pins timestamps as epoch-micro longs and list columns offset-packed
  * (starts[] + flat sorted values[]; `contain` = per-row range binary
  * search), so the full realistic predicate rides the filter-before-
  * distance gate.
  *
  * The test tables carry no timestamp/array columns (TESTDATA.md), so
  * both engines DERIVE them with integer arithmetic from `doc_id` —
  * deterministic, zone-free wall-clock values, expressed identically in
  * Spark and DuckDB; the filter AST is parsed from self-query WIRE text
  * and renders the oracle WHERE via [[SelfQueryFilter.toSql]], one
  * source of truth (q121's recipe verbatim).
  */
object Round8Queries {

  private val qText = "vector search with metadata predicates"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  /** Self-query wire payload: a pubdate range + an author membership —
    * `and(gt(pubdate, d1), lte(pubdate, d2), contain(authors, a))`.
    * The date strings parse to timestamp literals ([[SelfQueryParser]]'s
    * `parseDateTimeBestEffort` mirror); the author literal stays a
    * string.
    */
  private val wire =
    s"""```json
       |{
       |    "query": "$qText",
       |    "filter": "and(gt(\\"pubdate\\", \\"2020-03-01\\"), lte(\\"pubdate\\", \\"2022-06-15\\"), contain(\\"authors\\", \\"author3\\"))"
       |}
       |```""".stripMargin

  /** Derived corpus: pubdate = 2020-01-01 + (doc_id % 1000) days as a
    * TIMESTAMP; authors = two deterministic names (doc_id % 7 and
    * 7 + doc_id % 13 — overlapping ranges so `contain` has both single-
    * and double-hit rows).
    */
  private def corpus(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e = Tables.embeddings(s, dir)
    val d = Tables.documents(s, dir)
    e.join(d, e("vec_id") === d("doc_id"))
      .select(e("vec_id"), e("embedding"),
        date_add(lit("2020-01-01").cast("date"),
          (d("doc_id") % 1000).cast("int")).cast("timestamp").as("pubdate"),
        array(
          concat(lit("author"), (d("doc_id") % 7).cast("string")),
          concat(lit("author"), (d("doc_id") % 13 + 7).cast("string")))
          .as("authors"),
        d("lang"))
  }

  private val corpusSql =
    s"""c AS (
      SELECT e.vec_id, e.embedding,
        CAST(DATE '2020-01-01' + CAST(d.doc_id % 1000 AS INT) AS TIMESTAMP) AS pubdate,
        ['author' || CAST(d.doc_id % 7 AS VARCHAR),
         'author' || CAST(d.doc_id % 13 + 7 AS VARCHAR)] AS authors,
        d.lang
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    )"""

  /** Shared oracle: brute force over the derived corpus under the SAME
    * AST's WHERE — gates both the packed-scan path (q145) and the
    * full-ef graph path (q146).
    */
  private lazy val timeMetaOracle: String = {
    val where = SelfQueryFilter.toSql(
      SelfQueryParser.parseRequest(wire).filter.get)
    s"""
      WITH $corpusSql
      SELECT vec_id, strftime(pubdate, '%Y-%m-%d') AS pub, lang,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM c
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10"""
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- pubdate range + contain(authors) on the pinned packed scan ----
    QueryDef("q145_filtered_knn_timemeta", (s, dir) => {
      val c = corpus(s, dir)
      val req = SelfQueryParser.parseRequest(wire)
      val scan = PackedScan.buildCached(c, dir + "#timemeta", "vec_id",
        "embedding", Seq("pubdate", "authors"))
      val qv = HashEmbedder.embed(req.query)
      scan.topKDF(s, qv, 10, req.filter)
        .join(c.select(col("vec_id"),
          date_format(col("pubdate"), "yyyy-MM-dd").as("pub"), col("lang")),
          Seq("vec_id"))
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), col("pub"), col("lang"),
          round(col("dist"), 6).as("dist"))
    }, Some(timeMetaOracle)),

    // ---- the same predicate on the graph structure (full ef ⇒ exact) ---
    QueryDef("q146_graph_filtered_timemeta", (s, dir) => {
      val c = corpus(s, dir)
      val req = SelfQueryParser.parseRequest(wire)
      val g = GraphAnn.buildCached(c, dir + "#timemeta", "vec_id", "embedding",
        metaCols = Seq("pubdate", "authors"))
      val qv = HashEmbedder.embed(req.query)
      g.topKDF(s, qv, 10, ef = g.rows.toInt, filter = req.filter)
        .join(c.select(col("vec_id"),
          date_format(col("pubdate"), "yyyy-MM-dd").as("pub"), col("lang")),
          Seq("vec_id"))
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), col("pub"), col("lang"),
          round(col("dist"), 6).as("dist"))
    }, Some(timeMetaOracle)),

    // ---- DURABLE filtered serving, lexical leg (r7 verdict item 3) ----
    // A metadata-pinned Bm25Index saves its row-gate columns with the
    // postings (typed parquet under meta/), and the reload — which takes
    // ONLY the artifact path, so it cannot re-tokenize or re-pack meta
    // from the corpus — serves the same filtered query hash-exact. The
    // r7 behavior (refuse to save when pinned, forcing a restarted
    // filtered tier to re-read the source table) is retired.
    QueryDef("q147_bm25_durable_filtered", (s, dir) => {
      import graft.operators.{AnnIndex, Bm25Index}
      val node: SelfQueryFilter.Node = SelfQueryFilter.And.of(
        SelfQueryFilter.Eq("lang", SelfQueryFilter.S("en")),
        SelfQueryFilter.Gt("n_chars", SelfQueryFilter.I(150)))
      val ix = Bm25Index.build(Tables.documents(s, dir), "doc_id", "text",
        metaCols = Seq("lang", "n_chars"))
      val path = AnnIndex.tmpRoot + "/bm25_durable_meta_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      Bm25Index.save(s, ix, path)
      ix.unpersist()
      val loaded = Bm25Index.load(s, path)
      try loaded.topKDF(s, Round7Queries.bmTerms, 20, Some(node))
      finally loaded.unpersist()
    }, Some(s"""
      ${Round7Queries.bmWith}
      SELECT b.doc_id, dl, round(${Round7Queries.bmScore}, 6) AS bm25
      FROM base b CROSS JOIN stats
      JOIN documents dd ON b.doc_id = dd.doc_id
      WHERE tf0 + tf1 + tf2 > 0 AND (dd.lang = 'en' AND dd.n_chars > 150)
      ORDER BY bm25 DESC, b.doc_id
      LIMIT 20""")),

    // ---- DURABLE filtered serving, graph leg ----
    // The routed structure (IVF routing × per-cluster NSW) with pubdate +
    // authors pinned: save persists the typed meta cells beside each
    // node's adjacency plus a (name, kind) schema, load re-packs the row
    // gate from the artifact alone, and the reloaded index serves the
    // realistic self-query predicate hash-exact (nprobe = all clusters +
    // full ef ⇒ exhaustive within the filter, q115's exactness recipe).
    QueryDef("q148_graph_durable_filtered", (s, dir) => {
      import graft.operators.{AnnIndex, IvfGraph}
      val c = corpus(s, dir)
      val req = SelfQueryParser.parseRequest(wire)
      val (model, indexed) = AnnIndex.fit(c, "embedding", "vec_id", k = 8, iters = 2)
      val g = IvfGraph.build(indexed, model, "vec_id", "embedding",
        metaCols = Seq("pubdate", "authors"))
      val path = AnnIndex.tmpRoot + "/graph_durable_meta_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      IvfGraph.save(s, g, path)
      g.unpersist()
      val loaded = IvfGraph.load(s, path)
      try {
        val qv = HashEmbedder.embed(req.query)
        loaded.topKDF(s, qv, 10, nprobe = loaded.nClusters,
          ef = loaded.rows.toInt, filter = req.filter)
          .join(c.select(col("vec_id"),
            date_format(col("pubdate"), "yyyy-MM-dd").as("pub"), col("lang")),
            Seq("vec_id"))
          .orderBy(col("dist"), col("vec_id"))
          .select(col("vec_id"), col("pub"), col("lang"),
            round(col("dist"), 6).as("dist"))
      } finally loaded.unpersist()
    }, Some(timeMetaOracle))
  )
}
