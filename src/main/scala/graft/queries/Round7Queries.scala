package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder
import graft.operators.{Bm25Index, PackedScan, SelfQueryFilter, SelfQueryParser}

/** Round-7 battery: the SERVING-capability gap queries — the query shapes
  * the reference's users actually send against the pinned serving
  * structures.
  *
  * q121: FILTERED ANN serving. The reference's dominant query is a
  * structured predicate composed with a vector top-k — self-query emits
  * `PREWHERE where_str ORDER BY distance(...) LIMIT k`
  * (`app/backend/vector_store/myscale_without_metadata.py:20-36`) and
  * per-user KB retrievals filter `user_id = ... AND file_name IN (...)`
  * (`app/backend/chat_bot/private_knowledge_base.py:161`). The DataFrame
  * path answers this exactly (q21); this gates the PINNED path: raw
  * self-query wire text → [[SelfQueryParser]] → [[MetaPredicate]] row
  * gate inside [[PackedScan.topKBatch]]. The SAME AST renders the oracle
  * WHERE via [[SelfQueryFilter.toSql]], so Spark and DuckDB compile one
  * source of truth.
  *
  * q122: TOMBSTONE-aware serving. The reference deletes from indexed
  * tables while serving (`private_knowledge_base.py:93-99,136-138`);
  * deleted rows must stop being served WITHOUT a rebuild. Gate: build the
  * pinned relation, tombstone every third id, and the served top-k must
  * equal DuckDB's brute force over the remaining rows.
  *
  * Exactness recipe as q108: the packed kernel reduces in canonical
  * VectorKernels order (bit-identical to the DataFrame scan), order by
  * unrounded distance then id, round(6) only in the projection.
  */
object Round7Queries {

  private val qText = "distributed vector search engine"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  /** The raw self-query LLM wire payload for q121 — parsing this envelope
    * is part of the path under test.
    */
  private val wire =
    s"""```json
       |{
       |    "query": "$qText",
       |    "filter": "and(eq(\\"lang\\", \\"en\\"), gt(\\"n_chars\\", 250), in(\\"source\\", [\\"src1\\", \\"src3\\", \\"src5\\", \\"src7\\"]))"
       |}
       |```""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- filtered ANN on the pinned serving path -----------------------
    QueryDef("q121_filtered_knn_served", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val d = Tables.documents(s, dir)
      val corpus = e.join(d, e("vec_id") === d("doc_id"))
        .select(e("vec_id"), e("embedding"), d("lang"), d("source"), d("n_chars"))
      val req = SelfQueryParser.parseRequest(wire)
      val scan = PackedScan.buildCached(corpus, dir + "#meta", "vec_id",
        "embedding", Seq("lang", "source", "n_chars"))
      val qv = HashEmbedder.embed(req.query)
      scan.topKDF(s, qv, 10, req.filter)
        .join(corpus.select(col("vec_id"), col("lang"), col("n_chars")), Seq("vec_id"))
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), col("lang"), col("n_chars"),
          round(col("dist"), 6).as("dist"))
    }, Some {
      val where = SelfQueryFilter.toSql(
        SelfQueryParser.parseRequest(wire).filter.get)
      s"""
      SELECT e.vec_id, d.lang, d.n_chars,
        round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), e.vec_id
      LIMIT 10"""
    }),

    // ---- tombstone-aware serving (delete without rebuild) --------------
    // Uncached build on purpose: deletes mutate the instance, and the
    // shared q108 cache key must never serve a tombstoned view. (A real
    // lifecycle keys the cached instance per table version and applies
    // MVCC tombstones — see MvccCatalog; this gate isolates the scan-side
    // mechanism.)
    QueryDef("q122_knn_tombstone_served", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val scan = PackedScan.build(e, "vec_id", "embedding")
      try {
        scan.delete(0L until scan.rows by 3L)
        scan.topKDF(s, qVec, 10)
          .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
          .orderBy(col("dist"), col("vec_id"))
          .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
      } finally scan.unpersist()
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE vec_id % 3 <> 0
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- index delete on the graph serving structure -------------------
    // Where q122 tombstones at serve time, this REBUILDS: IvfGraph.remove
    // rebuilds only the clusters containing removed ids (append's delete
    // twin); full probe + full ef then equals the exhaustive scan over
    // the remaining rows, so the removed index is hash-gated end-to-end
    // by the same brute-force oracle.
    QueryDef("q123_graph_remove_served", (s, dir) => {
      import graft.operators.{AnnIndex, IvfGraph}
      val e = Tables.embeddings(s, dir)
      val (model, indexed) = AnnIndex.fitCached(
        e, dir, "embedding", "vec_id", k = 16, iters = 3)
      val g = IvfGraph.buildCached(indexed, model, dir, "vec_id", "embedding")
      val (removed, _) = IvfGraph.remove(g, 0L until g.rows by 3L)
      try {
        removed.topKDF(s, qVec, 10, nprobe = 16, ef = removed.rows.toInt)
          .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
          .orderBy(col("dist"), col("vec_id"))
          .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
      } finally removed.unpersist()
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE vec_id % 3 <> 0
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- true incremental graph insert, gated end-to-end ---------------
    // q123's twin on the INSERT side: IvfGraph.insertInto routes a batch
    // through the frozen centroids and inserts each new node with ONE
    // beam search (GraphAnn.insert) — no cluster rebuild; per-batch cost
    // is the batch's beam work (spec measures it flat in cluster size).
    // Full probe + full ef on the inserted index = brute force over the
    // union corpus, which DuckDB expresses as UNION ALL — so the whole
    // route-insert-serve path is hash-gated.
    QueryDef("q126_graph_insert_served", (s, dir) => {
      import graft.operators.{AnnIndex, IvfGraph}
      val e = Tables.embeddings(s, dir)
      val (model, indexed) = AnnIndex.fitCached(
        e, dir, "embedding", "vec_id", k = 16, iters = 3)
      val g = IvfGraph.buildCached(indexed, model, dir, "vec_id", "embedding")
      val batch = e.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      val (ins, _) = IvfGraph.insertInto(g, batch, "vec_id", "embedding")
      try {
        ins.topKDF(s, qVec, 10, nprobe = 16, ef = ins.rows.toInt)
          .orderBy(col("dist"), col("vec_id"))
          .select(col("vec_id"), round(col("dist"), 6).as("dist"))
      } finally ins.unpersist()
    }, Some(s"""
      WITH u AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 10000000, embedding FROM embeddings WHERE vec_id % 7 = 0
      )
      SELECT vec_id,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM u
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- servable inverted index: BM25 from postings -------------------
    // q118's full scan is the oracle shape; this serves the same ranking
    // from a term-partitioned posting structure (Bm25Index) with a REAL
    // tokenizer on both engines (split on non-alphanumerics — the r6
    // verdict's fix for the substring-tf compromise). Per-query work is
    // O(Σ df) over matching postings, not a corpus scan.
    QueryDef("q124_bm25_inverted", (s, dir) => {
      val ix = Bm25Index.buildCached(Tables.documents(s, dir), dir, "doc_id", "text")
      ix.topKDF(s, bmTerms, 20)
    }, Some(s"""
      $bmWith
      SELECT doc_id, dl, round($bmScore, 6) AS bm25
      FROM base CROSS JOIN stats
      WHERE tf0 + tf1 + tf2 > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT 20""")),

    // ---- hybrid RRF fused from the two SERVED legs ---------------------
    // q117 fuses DataFrame legs; this is the serving configuration: the
    // vector leg from the pinned PackedScan (q108's structure) and the
    // lexical leg from the posting index (q124's), RRF-fused exactly as
    // Cormack et al. — ranks are leg-local, the fusion join touches
    // <= 100 rows, and the whole request is two scatter-gather jobs.
    QueryDef("q125_hybrid_served", (s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      val scan = PackedScan.buildCached(e, dir, "vec_id", "embedding")
      val vleg = scan.topK(qVec, 50).zipWithIndex
        .map { case ((id, _), i) => (id, (i + 1).toLong) }
        .toSeq.toDF("id", "r_v")
      val ix = Bm25Index.buildCached(Tables.documents(s, dir), dir, "doc_id", "text")
      val kleg = ix.topK(bmTerms, 50).zipWithIndex
        .map { case ((doc, _, _), i) => (doc, (i + 1).toLong) }
        .toSeq.toDF("id", "r_k")
      vleg.join(kleg, Seq("id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("r_v")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_k")), lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("id"))
        .limit(20)
        .select(col("id"), col("r_v"), col("r_k"), col("rrf"))
    }, Some(s"""
      $bmWith,
      k AS (
        SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS r_k
        FROM (
          SELECT doc_id AS id, round($bmScore, 6) AS bm25
          FROM base CROSS JOIN stats
          WHERE tf0 + tf1 + tf2 > 0
          ORDER BY bm25 DESC, doc_id LIMIT 50)
      ), v AS (
        SELECT vec_id AS id,
               row_number() OVER (ORDER BY dist, vec_id) AS r_v
        FROM (
          SELECT vec_id,
                 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              CAST($qLit AS DOUBLE[])) AS dist
          FROM embeddings
          ORDER BY dist, vec_id LIMIT 50)
      )
      SELECT COALESCE(v.id, k.id) AS id, r_v, r_k,
             round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_v), CAST(0.0 AS DOUBLE)) +
                   COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_k), CAST(0.0 AS DOUBLE)), 6) AS rrf
      FROM v FULL OUTER JOIN k ON v.id = k.id
      ORDER BY rrf DESC, id
      LIMIT 20"""))
  ) :+ filteredHybrid :+ mvccServed :+ graphFiltered :+ graphFilteredTomb :+
    pqFiltered :+ bm25Insert :+ bm25Delete :+ bm25SaveLoad :+ packedInsert :+
    kbDeleteHybrid

  /** q143: the private-KB DELETE propagated to BOTH served legs and
    * fused — the reference's "remove a file from my knowledge base"
    * action (`private_knowledge_base.py:93-99,136-138`) as one request:
    * every doc of one source ("file") is tombstoned on the vector tier
    * (PackedScan) AND the lexical tier (Bm25Index), then a hybrid RRF
    * query must rank only surviving docs. Oracle semantics per tier:
    * the vector leg is brute force over REMAINING rows (a tombstone
    * removes the row from distance candidacy); the lexical leg scores
    * with FULL-corpus stats and excludes tombstoned docs from results
    * only (the Lucene deleted-docs contract q138 gates).
    */
  private def kbDeleteHybrid = QueryDef("q143_kb_delete_hybrid", (s, dir) => {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val d = Tables.documents(s, dir)
    val corpus = e.join(d, e("vec_id") === d("doc_id"))
      .select(e("vec_id"), e("embedding"))
    val scan = PackedScan.build(corpus, "vec_id", "embedding")
    val ix = Bm25Index.build(Tables.documents(s, dir), "doc_id", "text")
    try {
      val victims = d.filter(col("source") === "src2")
        .select(col("doc_id")).as[Long].collect() // one "file": bounded
      scan.delete(victims)
      ix.delete(victims)
      val vleg = scan.topK(qVec, 50).zipWithIndex
        .map { case ((id, _), i) => (id, (i + 1).toLong) }
        .toSeq.toDF("id", "r_v")
      val kleg = ix.topK(bmTerms, 50).zipWithIndex
        .map { case ((doc, _, _), i) => (doc, (i + 1).toLong) }
        .toSeq.toDF("id", "r_k")
      vleg.join(kleg, Seq("id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("r_v")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_k")), lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("id"))
        .limit(20)
        .select(col("id"), col("r_v"), col("r_k"), col("rrf"))
    } finally { scan.unpersist(); ix.unpersist() }
  }, Some(s"""
      $bmWith,
      k AS (
        SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS r_k
        FROM (
          SELECT b.doc_id AS id, round($bmScore, 6) AS bm25
          FROM base b CROSS JOIN stats
          JOIN documents dd ON b.doc_id = dd.doc_id
          WHERE tf0 + tf1 + tf2 > 0 AND dd.source <> 'src2'
          ORDER BY bm25 DESC, b.doc_id LIMIT 50)
      ), v AS (
        SELECT e.vec_id AS id,
               row_number() OVER (ORDER BY dist, e.vec_id) AS r_v
        FROM (
          SELECT ee.vec_id,
                 1.0 - list_cosine_similarity(CAST(ee.embedding AS DOUBLE[]),
                                              CAST($qLit AS DOUBLE[])) AS dist
          FROM embeddings ee JOIN documents d2 ON ee.vec_id = d2.doc_id
          WHERE d2.source <> 'src2'
          ORDER BY dist, ee.vec_id LIMIT 50) e
      )
      SELECT COALESCE(v.id, k.id) AS id, r_v, r_k,
             round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_v), CAST(0.0 AS DOUBLE)) +
                   COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_k), CAST(0.0 AS DOUBLE)), 6) AS rrf
      FROM v FULL OUTER JOIN k ON v.id = k.id
      ORDER BY rrf DESC, id
      LIMIT 20"""))

  /** q142: INCREMENTAL insert on the brute-force serving tier —
    * [[PackedScan.insert]] packs the batch into NEW pinned blocks and
    * serves the union (the LSM shape on the packed relation; existing
    * blocks untouched, per-batch cost ∝ batch). With this every pinned
    * serving structure supports live insert: IvfGraph q126, Bm25Index
    * q137, PackedScan here. Gate: build on 4/5 of the corpus, insert the
    * rest, served top-k must hash-equal brute force over ALL rows —
    * q108's oracle shape verbatim.
    */
  private def packedInsert = QueryDef("q142_knn_insert_served", (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val scan = PackedScan.build(e.filter(col("vec_id") % 5 =!= 2), "vec_id", "embedding")
    val scan2 = scan.insert(e.filter(col("vec_id") % 5 === 2), "vec_id", "embedding")
    try {
      scan2.topKDF(s, qVec, 10)
        .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    } finally { scan2.unpersist(); scan.unpersist() }
  }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10"""))

  /** q137: INCREMENTAL lexical insert — the "upload, then query
    * immediately" workload on the LEXICAL leg (the vector leg's q126).
    * Build the posting index on 3/4 of the corpus, [[Bm25Index.insert]]
    * the rest as a segment batch (COW df patch on existing segments,
    * exact N/sumDl advance), and the served top-k must hash-equal the
    * full-scan BM25 over the WHOLE corpus — q124's oracle verbatim, so
    * the gate proves insert ≡ rebuild.
    */
  private def bm25Insert = QueryDef("q137_bm25_insert_served", (s, dir) => {
    val docs = Tables.documents(s, dir)
    val ix = Bm25Index.build(docs.filter(col("doc_id") % 4 =!= 3), "doc_id", "text")
    val ix2 = ix.insert(docs.filter(col("doc_id") % 4 === 3), "doc_id", "text")
    try ix2.topKDF(s, bmTerms, 20)
    finally { ix2.unpersist(); ix.unpersist() }
  }, Some(s"""
      $bmWith
      SELECT doc_id, dl, round($bmScore, 6) AS bm25
      FROM base CROSS JOIN stats
      WHERE tf0 + tf1 + tf2 > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""))

  /** q141: DURABLE lexical index — the q119/q120 save/load story on the
    * lexical leg: build → save (one posting table PARTITIONED BY shard +
    * stats + tombstones) → load (re-pack, never re-tokenize) → serve,
    * hash-exact against q124's full-corpus oracle verbatim. Round-trip
    * internals (bit-equal scores, tombstone persistence, insert-into-
    * loaded routing) are spec-gated in Bm25IndexSpec.
    */
  private def bm25SaveLoad = QueryDef("q141_bm25_saveload", (s, dir) => {
    import graft.operators.AnnIndex
    val ix = Bm25Index.build(Tables.documents(s, dir), "doc_id", "text")
    val path = AnnIndex.tmpRoot + "/bm25_durable_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    Bm25Index.save(s, ix, path)
    ix.unpersist()
    val loaded = Bm25Index.load(s, path)
    try loaded.topKDF(s, bmTerms, 20)
    finally loaded.unpersist()
  }, Some(s"""
      $bmWith
      SELECT doc_id, dl, round($bmScore, 6) AS bm25
      FROM base CROSS JOIN stats
      WHERE tf0 + tf1 + tf2 > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""))

  /** q138: TOMBSTONE-aware lexical serving — DELETE reaches the posting
    * index without a rebuild (q122's contract on the lexical leg; the
    * reference deletes from serving tables at
    * `private_knowledge_base.py:93-99,136-138`). Corpus statistics stay
    * index-level until compaction (the Lucene deleted-docs semantics),
    * so the oracle scores with FULL-corpus stats and excludes tombstoned
    * docs from the results only.
    */
  private def bm25Delete = QueryDef("q138_bm25_delete_served", (s, dir) => {
    val ix = Bm25Index.build(Tables.documents(s, dir), "doc_id", "text")
    try {
      ix.delete(0L until ix.docCount by 7L)
      ix.topKDF(s, bmTerms, 20)
    } finally ix.unpersist()
  }, Some(s"""
      $bmWith
      SELECT doc_id, dl, round($bmScore, 6) AS bm25
      FROM base CROSS JOIN stats
      WHERE tf0 + tf1 + tf2 > 0 AND doc_id % 7 <> 0
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""))

  /** The reference's PRIVATE-KB request shape, end-to-end on the served
    * structures: a structured predicate (per-user / per-language scoping,
    * `private_knowledge_base.py:161`) composed with BOTH retrieval legs —
    * the vector leg filters through the pinned metadata row gate (q121's
    * machinery), the lexical leg through per-doc metadata pinned in the
    * posting shards. Corpus statistics (df/N/avgdl) stay corpus-level —
    * the filter gates which docs RETURN, matching an engine whose index
    * stats are global; the oracle mirrors that with WHERE on the scored
    * rows only. RRF-fused as q125.
    */
  private def filteredHybrid = QueryDef("q127_filtered_hybrid_served", (s, dir) => {
    import s.implicits._
    val node: SelfQueryFilter.Node = SelfQueryFilter.Eq("lang", SelfQueryFilter.S("en"))
    val e = Tables.embeddings(s, dir)
    val d = Tables.documents(s, dir)
    val corpus = e.join(d, e("vec_id") === d("doc_id"))
      .select(e("vec_id"), e("embedding"), d("lang"), d("source"), d("n_chars"))
    val scan = PackedScan.buildCached(corpus, dir + "#meta", "vec_id",
      "embedding", Seq("lang", "source", "n_chars"))
    val vleg = scan.topK(qVec, 50, Some(node)).zipWithIndex
      .map { case ((id, _), i) => (id, (i + 1).toLong) }
      .toSeq.toDF("id", "r_v")
    val ix = Bm25Index.buildCached(Tables.documents(s, dir), dir + "#meta",
      "doc_id", "text", metaCols = Seq("lang"))
    val kleg = ix.topK(bmTerms, 50, Some(node)).zipWithIndex
      .map { case ((doc, _, _), i) => (doc, (i + 1).toLong) }
      .toSeq.toDF("id", "r_k")
    vleg.join(kleg, Seq("id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("r_v")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_k")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("id"))
      .limit(20)
      .select(col("id"), col("r_v"), col("r_k"), col("rrf"))
  }, Some(s"""
      $bmWith,
      k AS (
        SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS r_k
        FROM (
          SELECT b.doc_id AS id, round($bmScore, 6) AS bm25
          FROM base b CROSS JOIN stats
          JOIN documents dd ON b.doc_id = dd.doc_id
          WHERE tf0 + tf1 + tf2 > 0 AND (dd.lang = 'en')
          ORDER BY bm25 DESC, b.doc_id LIMIT 50)
      ), v AS (
        SELECT e.vec_id AS id,
               row_number() OVER (ORDER BY dist, e.vec_id) AS r_v
        FROM (
          SELECT ee.vec_id,
                 1.0 - list_cosine_similarity(CAST(ee.embedding AS DOUBLE[]),
                                              CAST($qLit AS DOUBLE[])) AS dist
          FROM embeddings ee JOIN documents d2 ON ee.vec_id = d2.doc_id
          WHERE (d2.lang = 'en')
          ORDER BY dist, ee.vec_id LIMIT 50) e
      )
      SELECT COALESCE(v.id, k.id) AS id, r_v, r_k,
             round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_v), CAST(0.0 AS DOUBLE)) +
                   COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_k), CAST(0.0 AS DOUBLE)), 6) AS rrf
      FROM v FULL OUTER JOIN k ON v.id = k.id
      ORDER BY rrf DESC, id
      LIMIT 20"""))

  /** MVCC → SERVING lifecycle, gated end-to-end (closing the loop the r6
    * verdict asked to document: how a pinned structure tracks table
    * deletes). v1: create the table and pin it. v2: `DELETE WHERE` via
    * [[graft.operators.MvccCatalog.deleteWhere]] — the served structure
    * picks up EXACTLY the catalog's tombstone keys
    * ([[graft.operators.MvccCatalog.deletedKeys]] →
    * [[PackedScan.delete]]), no rebuild, and must then agree with
    * DuckDB's brute force over the remaining rows. (The rebuild path —
    * ServingCache eviction → rebuild from the current snapshot, zero
    * tombstones — is spec-gated in MvccCatalogSpec.)
    */
  private def mvccServed = QueryDef("q128_mvcc_served_lifecycle", (s, dir) => {
    import graft.operators.{AnnIndex, MvccCatalog}
    import s.implicits._
    val root = AnnIndex.tmpRoot + "/mvcc_served_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
    val cat = MvccCatalog(s, root)
    val e = Tables.embeddings(s, dir)
    cat.create("vecs", e.select(col("vec_id"), col("embedding"), col("label")), version = 1L)
    val scan = PackedScan.build(
      cat.read("vecs", Seq("vec_id")).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding")
    try {
      cat.deleteWhere("vecs", col("vec_id") % 5 === 0, Seq("vec_id"), version = 2L)
      val ids = cat.deletedKeys("vecs").get.select(col("vec_id"))
        .as[Long].collect() // bounded: the delete batch, not the corpus
      scan.delete(ids)
      scan.topKDF(s, qVec, 10)
        .join(cat.read("vecs", Seq("vec_id")).select(col("vec_id"), col("label")),
          Seq("vec_id"))
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    } finally scan.unpersist()
  }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE vec_id % 5 <> 0
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10"""))

  /** FILTERED GRAPH serving — q121's request shape (self-query wire →
    * predicate + vector top-k) answered by the GRAPH structure instead of
    * the packed scan: metadata is pinned beside the nodes at build
    * ([[graft.operators.GraphAnn]] metaCols) and the beam admits only
    * predicate survivors into the result heap while traversing the full
    * graph (the hnswlib filtered-search shape — connectivity never
    * depends on the predicate). Exactness: full ef ⇒ every (connected)
    * node is visited ⇒ equals the filtered brute force, so the SAME
    * oracle SQL that gates q121 gates this path; the serving operating
    * point (small ef) is spec-gated on measured recall in GraphAnnSpec.
    */
  private def graphFiltered = QueryDef("q129_graph_filtered_served", (s, dir) => {
    import graft.operators.GraphAnn
    val e = Tables.embeddings(s, dir)
    val d = Tables.documents(s, dir)
    val corpus = e.join(d, e("vec_id") === d("doc_id"))
      .select(e("vec_id"), e("embedding"), d("lang"), d("source"), d("n_chars"))
    val req = SelfQueryParser.parseRequest(wire)
    val g = GraphAnn.buildCached(corpus, dir + "#meta", "vec_id", "embedding",
      metaCols = Seq("lang", "source", "n_chars"))
    val qv = HashEmbedder.embed(req.query)
    g.topKDF(s, qv, 10, ef = g.rows.toInt, filter = req.filter)
      .join(corpus.select(col("vec_id"), col("lang"), col("n_chars")), Seq("vec_id"))
      .orderBy(col("dist"), col("vec_id"))
      .select(col("vec_id"), col("lang"), col("n_chars"),
        round(col("dist"), 6).as("dist"))
  }, Some {
    val where = SelfQueryFilter.toSql(
      SelfQueryParser.parseRequest(wire).filter.get)
    s"""
      SELECT e.vec_id, d.lang, d.n_chars,
        round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), e.vec_id
      LIMIT 10"""
  })

  /** FILTERED + TOMBSTONED routed-graph serving — the full private-KB
    * lifecycle on the MSTG-shape structure: per-cluster graphs built with
    * pinned metadata, a predicate gating results, AND serve-time deletes
    * ([[graft.operators.IvfGraph.delete]] — maintenance ops on filtered
    * structures are tombstone + rebuild, never in-place). Full probe +
    * full ef ⇒ equals DuckDB's brute force over the remaining predicate
    * survivors. Uncached build on purpose: deletes mutate the instance
    * (q122's reasoning).
    */
  private def graphFilteredTomb = QueryDef("q130_graph_filtered_tombstone", (s, dir) => {
    import graft.operators.{AnnIndex, IvfGraph, SelfQueryFilter => F}
    val e = Tables.embeddings(s, dir)
    val d = Tables.documents(s, dir)
    val (model, indexed) = AnnIndex.fitCached(
      e, dir, "embedding", "vec_id", k = 16, iters = 3)
    val withMeta = indexed.join(d, indexed("vec_id") === d("doc_id"))
      .select(indexed("cluster_id"), indexed("vec_id"), indexed("embedding"),
        d("lang"))
    val g = IvfGraph.build(withMeta, model, "vec_id", "embedding",
      metaCols = Seq("lang"))
    try {
      // deleted ids DERIVED from the data (q128's pattern), not assumed
      // from an id-domain layout; bounded: a third of the corpus keys
      import s.implicits._
      g.delete(withMeta.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id")).as[Long].collect())
      val node: F.Node = F.Eq("lang", F.S("en"))
      g.topKDF(s, qVec, 10, nprobe = 16, ef = g.rows.toInt, filter = Some(node))
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), round(col("dist"), 6).as("dist"))
    } finally g.unpersist()
  }, Some(s"""
      SELECT e.vec_id,
        round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE d.lang = 'en' AND e.vec_id % 3 <> 0
      ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), e.vec_id
      LIMIT 10"""))

  /** FILTERED QUANTIZED serving — the predicate shape on the PQ path,
    * which needs NO new machinery: the encoded relation is a DataFrame,
    * so the [[SelfQueryFilter.compile]]d predicate filters it BEFORE the
    * ADC shortlist (Catalyst pushes it to the scan) and the shortlist is
    * sized on SURVIVORS (q99's 25% operating point, floor 200) — k
    * results are all survivors, never post-filtered. One AST renders
    * both engines' predicate (compile → Spark, toSql → oracle WHERE).
    * With this, every serving structure answers the reference's filtered
    * query: PackedScan q121, Bm25Index q127, GraphAnn q129, IvfGraph
    * q130, PQ here.
    */
  private def pqFiltered = QueryDef("q131_pq_filtered", (s, dir) => {
    import graft.operators.{PqIndex, SelfQueryFilter => F}
    val e = Tables.embeddings(s, dir)
    val d = Tables.documents(s, dir)
    val corpus = e.join(d, e("vec_id") === d("doc_id"))
      .select(e("vec_id"), e("embedding"), e("label"), d("lang"))
    val node: F.Node = F.Eq("lang", F.S("en"))
    val model = PqIndex.fitCached(e, dir, "embedding", "vec_id")
    val enc = PqIndex.encodedCached(corpus, dir + "#meta", model, "embedding")
    val survivors = enc.filter(F.compile(node))
    // one count job sizes the shortlist on SURVIVORS (q99's 25% operating
    // point relative to what the predicate keeps, floor 200) — survivor-
    // relative sizing is the semantics a filtered serving tier needs; the
    // count is a cached-relation scan, the deliberate price
    val cand = math.max(200L, survivors.count() / 4).toInt
    PqIndex.search(model, survivors, "embedding", "vec_id", qVec,
      k = 10, candidates = cand)
      .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
  }, Some {
    val where = SelfQueryFilter.toSql(SelfQueryFilter.Eq("lang", SelfQueryFilter.S("en")))
    s"""
      SELECT e.vec_id, e.label,
        round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), e.vec_id
      LIMIT 10"""
  })

  /** Shared lexical probe terms (q124/q125). */
  private[queries] lazy val bmTerms = Seq("query", "scan", "data")

  /** Tokenized tf for term `t` — the DuckDB mirror of
    * [[Bm25Index.tokens]]: lowercase, split on non-alphanumerics, count
    * exact token matches.
    */
  private[queries] def tokTfSql(t: String): String =
    s"CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x = '$t')) AS BIGINT)"

  /** base + stats CTEs shared by q124/q125 (q118's shape with the real
    * tokenizer; every literal CAST to DOUBLE per the cross-engine
    * exactness rules in Round6Queries).
    */
  private[queries] lazy val bmWith: String = {
    val tfCols = bmTerms.zipWithIndex
      .map { case (t, i) => s"${tokTfSql(t)} AS tf$i" }.mkString(", ")
    val dfCols = bmTerms.indices
      .map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    s"""
      WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS BIGINT) AS dl,
               $tfCols
        FROM documents
      ), stats AS (
        SELECT count(*) AS n, sum(dl) AS sdl, $dfCols,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM base
      )"""
  }

  private[queries] lazy val bmScore: String = bmTerms.indices.map { i =>
    s"""ln((n - df$i + CAST(0.5 AS DOUBLE)) / (df$i + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
       * (tf$i * CAST(2.2 AS DOUBLE))
       / (tf$i + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))"""
  }.mkString(" + ")
}

