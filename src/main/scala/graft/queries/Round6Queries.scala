package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder

/** Round-6 battery: the TEXT-RETRIEVAL leg of a RAG serving engine.
  *
  * The reference retrieves by vector similarity plus structured filters
  * (`app/backend/vector_store/myscale_without_metadata.py:28-36`); a
  * production RAG stack pairs that with lexical retrieval and fuses the
  * two rankings — the standard public recipes are BM25 (Robertson &
  * Zaragoza 2009) and reciprocal-rank fusion (Cormack et al. SIGIR'09).
  * Both are exactly SQL-expressible, so unlike ANN these are hash-gated
  * end-to-end.
  *
  * Cross-engine exactness rules (beyond QueryDef's): every numeric
  * literal in the oracle is CAST to DOUBLE (a bare `0.5` is a DECIMAL in
  * DuckDB and decimal·int math is exact where double math rounds);
  * operand order is kept identical on both sides so IEEE ops agree
  * bit-for-bit; and the final ORDER BY uses the 6-dp ROUNDED score, so a
  * last-ulp library difference (ln) can never flip the output order —
  * the hash compare then proves the rounded scores themselves agree.
  */
object Round6Queries {

  private val qText = "distributed vector search engine"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  /** Occurrence count of `t` in `text` — the replace-length trick, pure
    * integer arithmetic both engines fold identically.
    */
  // REAL tokenizer (late r7, retiring the original substring-count tf —
  // the r6 "cross-engine exactness choice" nit): exact token matches via
  // the same lowercase/split/drop-empties pipeline Bm25Index and q124
  // use, mirrored in DuckDB. tf/df/dl now mean what an engine means.
  private def tf(t: String) =
    size(filter(graft.operators.Bm25Index.tokens(col("text")),
      x => x === lit(t))).cast("long")

  private def tfSql(t: String) =
    s"CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x = '$t')) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // ---- hybrid retrieval: vector leg + keyword leg, RRF-fused ---------
    // Each leg is top-50-then-rank (TakeOrderedAndProject + a 50-row
    // window — never a global row_number over the corpus), fused by a
    // full outer join on id: rrf = Σ_leg 1/(60 + rank_leg), the k=60
    // constant from Cormack et al. At 100 TB each leg is the same
    // scatter-gather top-k as q20; the fusion join touches ≤100 rows.
    QueryDef("q117_hybrid_rrf", (s, dir) => {
      import org.apache.spark.sql.graft.VectorFunctions.cosine_distance
      val vtop = Tables.embeddings(s, dir)
        .withColumn("dist", cosine_distance(col("embedding"), typedlit(qVec.toIndexedSeq)))
        .select(col("vec_id"), col("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(50)
      val vleg = vtop
        .withColumn("r_v", row_number().over(Window.orderBy(col("dist"), col("vec_id"))).cast("long"))
        .select(col("vec_id").as("id"), col("r_v"))
      val ktop = Tables.documents(s, dir)
        .select(col("doc_id"), (tf("query") + tf("scan")).as("tfs"))
        .filter(col("tfs") > 0)
        .orderBy(col("tfs").desc, col("doc_id")).limit(50)
      val kleg = ktop
        .withColumn("r_k", row_number().over(Window.orderBy(col("tfs").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id").as("id"), col("r_k"))
      vleg.join(kleg, Seq("id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("r_v")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_k")), lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("id"))
        .limit(20)
        .select(col("id"), col("r_v"), col("r_k"), col("rrf"))
    }, Some(s"""
      WITH v AS (
        SELECT vec_id AS id,
               row_number() OVER (ORDER BY dist, vec_id) AS r_v
        FROM (
          SELECT vec_id,
                 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              CAST($qLit AS DOUBLE[])) AS dist
          FROM embeddings
          ORDER BY dist, vec_id LIMIT 50)
      ), k AS (
        SELECT doc_id AS id,
               row_number() OVER (ORDER BY tfs DESC, doc_id) AS r_k
        FROM (
          SELECT doc_id, ${tfSql("query")} + ${tfSql("scan")} AS tfs
          FROM documents
          WHERE ${tfSql("query")} + ${tfSql("scan")} > 0
          ORDER BY tfs DESC, doc_id LIMIT 50)
      )
      SELECT COALESCE(v.id, k.id) AS id, r_v, r_k,
             round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_v), CAST(0.0 AS DOUBLE)) +
                   COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_k), CAST(0.0 AS DOUBLE)), 6) AS rrf
      FROM v FULL OUTER JOIN k ON v.id = k.id
      ORDER BY rrf DESC, id
      LIMIT 20""")),

    // ---- durable graph index, gated END-TO-END --------------------------
    // q115 gates the in-session IvfGraph; this saves it (node-level
    // parquet partitioned by cluster + frozen centroids), LOADS it in
    // place of the built one, and queries at full probe + full ef — the
    // exactness contract says that equals the exhaustive scan, so the
    // same oracle gates the whole save/load/serve path. GraphAnnSpec
    // additionally asserts the loaded blocks are bit-identical and that
    // load never runs graph construction.
    QueryDef("q119_graph_saveload", (s, dir) => {
      import graft.operators.{AnnIndex, IvfGraph}
      val e = Tables.embeddings(s, dir)
      val (model, indexed) = AnnIndex.fitCached(
        e, dir, "embedding", "vec_id", k = 16, iters = 3)
      val g = IvfGraph.buildCached(indexed, model, dir, "vec_id", "embedding")
      val path = AnnIndex.tmpRoot + "/ivfgraph_durable_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      IvfGraph.save(s, g, path)
      val loaded = IvfGraph.load(s, path)
      try {
        loaded.topKDF(s, qVec, 10, nprobe = 16, ef = loaded.rows.toInt)
          .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
          .orderBy(col("dist"), col("vec_id"))
          .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
      } finally loaded.unpersist()
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- durable PQ index, gated END-TO-END ------------------------------
    // q99 gates the in-session PQ path; this saves codebooks + codes to
    // parquet (the disk_mode=3 analog of the reference's MSTG DDL), loads
    // them back, and searches at C = N/4 where shortlist + exact re-rank
    // equals brute force — so the same oracle hash-gates training,
    // encoding, persistence, reload, and serving in one pass.
    QueryDef("q120_pq_saveload", (s, dir) => {
      import graft.operators.{AnnIndex, PqIndex}
      val e = Tables.embeddings(s, dir)
      val model = PqIndex.fitCached(e, dir, "embedding", "vec_id")
      val enc = PqIndex.encodedCached(e, dir, model, "embedding")
      val path = AnnIndex.tmpRoot + "/pq_durable_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      PqIndex.save(model, enc, path)
      val (lModel, lEnc) = PqIndex.load(s, path)
      val cand = math.max(200L, lEnc.count() / 4).toInt
      PqIndex.search(lModel, lEnc, "embedding", "vec_id", qVec, k = 10, candidates = cand)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- BM25 scoring (k1 = 1.2, b = 0.75) ------------------------------
    // Corpus stats (N, Σdl, df per term) reduce to ONE row and broadcast;
    // per-doc scoring is map-only over that single-row join — the plan is
    // one pass over the corpus regardless of scale. doclen = spaces + 1
    // (identical integer arithmetic both engines; tokenizer differences
    // like split-on-regex can't drift).
    QueryDef("q118_bm25", (s, dir) => {
      val terms = Seq("query", "scan", "data")
      val base = Tables.documents(s, dir).select(
        col("doc_id") +:
          size(graft.operators.Bm25Index.tokens(col("text")))
            .cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) => tf(t).as(s"tf$i") }: _*)
      val aggs = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = base.agg(aggs.head, aggs.tail: _*)
      val avgdl = col("sdl").cast("double") / col("n")
      def term(i: Int) = {
        val idf = log((col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)) + lit(1.0))
        idf * (col(s"tf$i") * lit(2.2)) /
          (col(s"tf$i") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
      }
      base.crossJoin(broadcast(stats))
        .withColumn("bm25", round(terms.indices.map(term).reduce(_ + _), 6))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("dl"), col("bm25"))
    }, Some {
      val terms = Seq("query", "scan", "data")
      val tfCols = terms.zipWithIndex
        .map { case (t, i) => s"${tfSql(t)} AS tf$i" }.mkString(", ")
      val dfCols = terms.indices
        .map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val score = terms.indices.map { i =>
        s"""ln((n - df$i + CAST(0.5 AS DOUBLE)) / (df$i + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
           * (tf$i * CAST(2.2 AS DOUBLE))
           / (tf$i + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))"""
      }.mkString(" + ")
      s"""
      WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS dl,
               $tfCols
        FROM documents
      ), stats AS (
        SELECT count(*) AS n, sum(dl) AS sdl, $dfCols,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM base
      )
      SELECT doc_id, dl, round($score, 6) AS bm25
      FROM base CROSS JOIN stats
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""
    })
  )
}
