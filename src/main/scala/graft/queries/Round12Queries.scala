package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Round-12 gated queries: deletion-vector lightweight deletes and the
  * rest of the r11 verdict's runway, each hash-exact vs a DuckDB oracle
  * recomputing the same net state.
  */
object Round12Queries {

  def defs: Seq[QueryDef] = Seq(

    // ---- q232: lightweight deletes (deletion-vector masks) ---------------
    // CH's `DELETE FROM t WHERE p` writes a `_row_exists` mask instead of
    // rewriting parts (reference deletes while serving:
    // `app/backend/chat_bot/private_knowledge_base.py:93-99,136-138`).
    // Here: two composed lightweight deletes (zero data bytes rewritten —
    // MaskSpec pins byte-untouchedness) + a heavy UPDATE mutation that
    // must read through the masks, then the net state gated vs DuckDB
    // recomputing it directly. No OPTIMIZE before the read: the MASKED
    // read path is what's gated.
    QueryDef("q232_lightweight_delete_mask", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q232").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("DELETE FROM d WHERE doc_id % 4 == 0")                  // cross-partition mask
      x("DELETE FROM d WHERE lang == 'en' AND n_chars < 600")   // composes with the first
      x("ALTER TABLE d UPDATE n_chars = n_chars + 1000000 WHERE lang == 'fr'")
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang, count(*) AS docs,
             CAST(sum(CASE WHEN lang = 'fr' THEN n_chars + 1000000
                           ELSE n_chars END) AS BIGINT) AS chars
      FROM documents
      WHERE NOT (doc_id % 4 = 0) AND NOT (lang = 'en' AND n_chars < 600)
      GROUP BY lang ORDER BY lang""")),

    // ---- q233: nested-layout partition-pruned mutations -------------------
    // The two-axis retention scheme (day=/lang= at 100 TB; here lang=/b=):
    // mutations rewrite only the matched LEAF directories — whole-subtree
    // ALTER DELETE drops dirs and cleans emptied ancestors, a partial
    // leaf delete rewrites one leaf, an UPDATE another (SourceCatalogSpec
    // pins byte-untouchedness of every other leaf; MutationSoak measures
    // the cost ratio). Net state gated vs DuckDB recomputing it.
    QueryDef("q233_nested_partition_mutations", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q233").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, b Int64, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY (lang, b)""")
      x("INSERT INTO d SELECT doc_id, lang, doc_id % 3 AS b, n_chars FROM documents")
      x("ALTER TABLE d DELETE WHERE lang == 'de'")              // whole subtree
      x("ALTER TABLE d DELETE WHERE lang == 'en' AND b == 1 AND n_chars < 600") // one leaf, partial
      x("ALTER TABLE d UPDATE n_chars = n_chars + 1000000 WHERE lang == 'fr' AND b == 2")
      x("""SELECT lang, b, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang, b ORDER BY lang, b""")
    }, Some("""
      SELECT lang, doc_id % 3 AS b, count(*) AS docs,
             CAST(sum(CASE WHEN lang = 'fr' AND doc_id % 3 = 2
                           THEN n_chars + 1000000 ELSE n_chars END) AS BIGINT) AS chars
      FROM documents
      WHERE lang <> 'de'
        AND NOT (lang = 'en' AND doc_id % 3 = 1 AND n_chars < 600)
      GROUP BY lang, doc_id % 3 ORDER BY lang, b""")),

    // ---- q234: quantile/topK -State matview widening ----------------------
    // The order-statistic states Summing cannot express and per-block
    // aggregation gets WRONG (a median of per-block medians is not the
    // median; a union of per-block top-3 lists is not the top-3):
    // quantileExactState carries the sorted value multiset, topKState the
    // exact value->count pairs, merged across three overlapping insert
    // blocks with an OPTIMIZE FINAL in the middle (materialize + keep
    // merging). Oracle: DuckDB computes rank-ceil(q*n) and top-3
    // (count desc, value asc) over the union directly.
    QueryDef("q234_chddl_quantile_topk_states", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q234").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE docs (doc_id Int64, lang String, source String,
           n_chars Int64) ENGINE = MergeTree ORDER BY doc_id""")
      x("""CREATE MATERIALIZED VIEW lang_stats
           ENGINE = AggregatingMergeTree ORDER BY lang
           AS SELECT lang, quantileExactState(n_chars, 0.5) AS med_chars,
                     topKState(source, 3) AS top_srcs,
                     countState(doc_id) AS n
              FROM docs GROUP BY lang""")
      x("""INSERT INTO docs SELECT doc_id, lang, source, n_chars
           FROM documents PREWHERE doc_id % 3 == 0""")
      x("""INSERT INTO docs SELECT doc_id, lang, source, n_chars
           FROM documents PREWHERE doc_id % 3 == 1""")
      x("OPTIMIZE TABLE lang_stats FINAL")
      x("""INSERT INTO docs SELECT doc_id, lang, source, n_chars
           FROM documents PREWHERE doc_id % 3 == 2""")
      x("""SELECT lang, med_chars,
                  arrayStringConcat(top_srcs, ',') AS top_srcs, n
           FROM lang_stats ORDER BY lang""")
    }, Some("""
      WITH r AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
               count(*) OVER (PARTITION BY lang) AS cnt
        FROM documents),
      med AS (
        SELECT lang, n_chars AS med_chars FROM r
        WHERE rk = CAST(ceil(0.5 * cnt) AS BIGINT)),
      c AS (
        SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
      ranked AS (
        SELECT lang, source,
               row_number() OVER (PARTITION BY lang ORDER BY c DESC, source) AS rk
        FROM c),
      tops AS (
        SELECT lang, string_agg(source, ',' ORDER BY rk) AS top_srcs
        FROM ranked WHERE rk <= 3 GROUP BY lang),
      ns AS (
        SELECT lang, CAST(count(doc_id) AS BIGINT) AS n
        FROM documents GROUP BY lang)
      SELECT med.lang, med.med_chars, tops.top_srcs, ns.n
      FROM med JOIN tops ON med.lang = tops.lang JOIN ns ON med.lang = ns.lang
      ORDER BY med.lang""")),

    // ---- q235: SETTINGS carry per-statement Spark conf intent -------------
    // CH tuning statements (`SETTINGS max_threads = N, max_memory_usage =
    // B`) now map onto a per-statement conf scope (shuffle partitions /
    // broadcast threshold — set for the statement, restored after;
    // ChSqlSpec pins the scope mechanics). The gate: a join+aggregate
    // executed UNDER the scope is hash-exact vs the plain oracle —
    // settings tune, they must never change results.
    QueryDef("q235_chsql_settings_scope", (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      graft.operators.ChSql.sql(s, """
        SELECT c.c_mktsegment AS seg, count(*) AS n,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS rev
        FROM orders o
        INNER JOIN customer c ON o.o_custkey = c.c_custkey
        PREWHERE o.o_orderstatus == 'F'
        GROUP BY c.c_mktsegment
        ORDER BY seg
        SETTINGS max_threads = 7, max_memory_usage = 64000000, optimize_read_in_order = 1""")
    }, Some("""
      SELECT c.c_mktsegment AS seg, count(*) AS n,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY c.c_mktsegment ORDER BY seg""")),

    // ---- q236: alias-less ARRAY JOIN (element shadows the column) ---------
    // CH's bare form `ARRAY JOIN words`: after the clause, `words` means
    // the ELEMENT in every outer clause — select list, WHERE, GROUP BY.
    // The rewriter re-projects the exploded element onto the source
    // column's name in a FROM-only wrapper subquery (q222 keeps gating the
    // aliased form; ChSqlSpec pins mixed/multi/LEFT shadow cases and the
    // still-loud expression/subquery forms).
    QueryDef("q236_chsql_array_join_shadow", (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("words", split(col("text"), " "))
        .select("doc_id", "lang", "words")
        .createOrReplaceTempView("docw")
      graft.operators.ChSql.sql(s, """
        SELECT lang, words, count(*) AS c
        FROM docw
        ARRAY JOIN words
        PREWHERE lang != 'de'
        WHERE words != ''
        GROUP BY lang, words
        ORDER BY c DESC, lang, words
        LIMIT 200""")
    }, Some("""
      SELECT lang, words, count(*) AS c FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS words
        FROM documents WHERE lang <> 'de') u
      WHERE words <> ''
      GROUP BY lang, words
      ORDER BY c DESC, lang, words
      LIMIT 200""")),

    // ---- q237: lightweight UPDATE (patch parts) ---------------------------
    // CH 25.x `UPDATE t SET ... WHERE` writes patch parts instead of
    // rewriting data. Two sequential patches — the second's predicate AND
    // RHS evaluate over the FIRST patch's values — then a lightweight
    // DELETE whose predicate sees both patches, read with zero data bytes
    // rewritten anywhere (MaskSpec pins byte-untouchedness). Oracle:
    // DuckDB applies the same three steps as chained CTEs.
    QueryDef("q237_lightweight_update_patch", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q237").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("UPDATE d SET n_chars = n_chars + 1000 WHERE doc_id % 7 == 0")
      x("UPDATE d SET n_chars = n_chars * 2 WHERE n_chars >= 1500")
      x("DELETE FROM d WHERE n_chars > 2600")
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      WITH p1 AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        FROM documents),
      p2 AS (
        SELECT doc_id, lang,
               CASE WHEN n_chars >= 1500 THEN n_chars * 2 ELSE n_chars END AS n_chars
        FROM p1)
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM p2 WHERE NOT (n_chars > 2600)
      GROUP BY lang ORDER BY lang""")),

    // ---- q238: exact-substring duplication (Lee et al. 2022) --------------
    // The ExactSubstr pass of arXiv:2107.06499 §4: every 8-token window
    // occurring more than once in the corpus marks its positions
    // duplicated; per-doc coverage is the training-data signal (dedup the
    // spans or drop the doc). The paper's suffix array becomes one
    // content-keyed shuffle + a semi-join back to (doc, pos) + per-doc
    // coverage union (Dedup.exactSubstrDuplication; the 8-token window is
    // the q110 decontamination convention). Oracle: DuckDB enumerates the
    // same windows and coverage directly.
    QueryDef("q238_exact_substring_dedup", (s, dir) => {
      Dedup.exactSubstrDuplication(
        Tables.documents(s, dir), "doc_id", "text", 8)
        .select(col("doc_id"), col("dup_tokens"),
          col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }, Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM documents),
      grams AS (
        SELECT doc_id, i AS pos, array_to_string(ts[i:i+7], ' ') AS g
        FROM toks, unnest(generate_series(1, len(ts) - 7)) AS u(i)),
      dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
      seeds AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
      cov AS (SELECT DISTINCT doc_id, t
              FROM seeds, unnest(generate_series(pos, pos + 7)) AS u(t)),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_tokens
              FROM cov GROUP BY doc_id)
      SELECT a.doc_id, a.dup_tokens, CAST(len(t.ts) AS BIGINT) AS n_tokens
      FROM agg a JOIN toks t ON a.doc_id = t.doc_id
      ORDER BY a.doc_id""")),

    // ---- q240: ExactSubstr span REMOVAL ------------------------------------
    // The paper's actual output (arXiv:2107.06499 §4 drops every
    // duplicated span from the training text): re-emit each affected doc
    // with covered tokens cut out. Oracle: DuckDB zips tokens with their
    // positions (parallel unnest), anti-joins the coverage set, and
    // re-joins the survivors in order.
    QueryDef("q240_exact_substring_clean", (s, dir) => {
      Dedup.exactSubstrClean(Tables.documents(s, dir), "doc_id", "text", 8)
        .filter(col("dup_tokens") > 0)
        .select(col("doc_id"), col("clean_text"),
          col("n_tokens").cast("long").as("n_tokens"), col("dup_tokens"))
        .orderBy("doc_id")
    }, Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM documents),
      grams AS (
        SELECT doc_id, i AS pos, array_to_string(ts[i:i+7], ' ') AS g
        FROM toks, unnest(generate_series(1, len(ts) - 7)) AS u(i)),
      dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
      seeds AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
      cov AS (SELECT DISTINCT doc_id, t
              FROM seeds, unnest(generate_series(pos, pos + 7)) AS u(t)),
      pos AS (SELECT doc_id, unnest(ts) AS tok,
                     unnest(generate_series(1, len(ts))) AS i
              FROM toks),
      clean AS (
        SELECT p.doc_id,
               coalesce(string_agg(CASE WHEN c.t IS NULL THEN p.tok END,
                                   ' ' ORDER BY p.i), '') AS clean_text,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(c.t) AS BIGINT) AS dup_tokens
        FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.i = c.t
        GROUP BY p.doc_id)
      SELECT doc_id, clean_text, n_tokens, dup_tokens
      FROM clean WHERE dup_tokens > 0
      ORDER BY doc_id""")),

    // ---- q239: lightweight mutations feed the serving rebuild -------------
    // The reference mutates indexed tables while serving
    // (`private_knowledge_base.py:93-99,136-138`); q128 closed the MVCC →
    // PackedScan lifecycle, this closes the CATALOG-sidecar one: a
    // lightweight DELETE mask + a lightweight UPDATE patch land on the
    // table, and the serving-tier rebuild (PackedScan over readRaw) must
    // pin the NET state — the filtered top-k runs the MetaPredicate over
    // the PATCHED metadata. Exactness recipe as q108/q121 (canonical
    // kernel order, round(6) in the projection only).
    QueryDef("q239_masked_rebuild_served", (s, dir) => {
      import graft.functions.HashEmbedder
      import graft.operators.{Catalog, ChDdl, PackedScan, SelfQueryParser}
      val e = Tables.embeddings(s, dir)
      val d = Tables.documents(s, dir)
      val corpus = e.join(d, e("vec_id") === d("doc_id"))
        .select(e("vec_id"), e("embedding"), d("lang"), d("n_chars"))
      val cat = Catalog(s,
        java.nio.file.Files.createTempDirectory("q239").toString)
      cat.create("corpus", corpus)
      cat.deleteWhereLight("corpus", col("vec_id") % 3 === 0)
      cat.updateWhereLight("corpus", col("lang") === "en",
        Map("n_chars" -> (col("n_chars") + 10000)))
      val req = SelfQueryParser.parseRequest(q239Wire)
      val scan = PackedScan.build(cat.readRaw("corpus"), "vec_id",
        "embedding", Seq("lang", "n_chars"))
      try {
        val qv = HashEmbedder.embed(req.query)
        scan.topKDF(s, qv, 10, req.filter)
          .join(cat.readRaw("corpus").select(col("vec_id"), col("lang"),
            col("n_chars")), Seq("vec_id"))
          .orderBy(col("dist"), col("vec_id"))
          .select(col("vec_id"), col("lang"), col("n_chars"),
            round(col("dist"), 6).as("dist"))
      } finally scan.unpersist()
    }, Some {
      import graft.functions.HashEmbedder
      import graft.operators.{SelfQueryFilter, SelfQueryParser}
      val req = SelfQueryParser.parseRequest(q239Wire)
      val where = SelfQueryFilter.toSql(req.filter.get)
      val qLit = HashEmbedder.sqlArrayLiteral(HashEmbedder.embed(req.query))
      s"""
      WITH net AS (
        SELECT e.vec_id, e.embedding, d.lang,
               CASE WHEN d.lang = 'en' THEN d.n_chars + 10000
                    ELSE d.n_chars END AS n_chars
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        WHERE e.vec_id % 3 <> 0)
      SELECT vec_id, lang, n_chars,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM net
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10"""
    })
  )

  /** q241/q242 are appended below q239 via defs2 (kept in one list). */
  def defsPartitionOps: Seq[QueryDef] = Seq(

    // ---- q241: partition manipulation lifecycle ----------------------------
    // The restatement workflow every CH operator leans on: recompute one
    // partition in a STAGING table, REPLACE it into prod (a directory
    // copy — zero rewrite), DETACH/ATTACH round-trip a second partition,
    // MOVE a third out to an archive table. Net state of both tables
    // gated vs DuckDB computing it directly.
    QueryDef("q241_partition_ops", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q241").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      for (t <- Seq("prod", "staging", "archive"))
        x(s"""CREATE TABLE $t (doc_id Int64, lang String, n_chars Int64)
             ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO prod SELECT doc_id, lang, n_chars FROM documents")
      x("""INSERT INTO staging SELECT doc_id, lang, n_chars + 1000000
           FROM documents PREWHERE lang == 'fr'""")
      x("ALTER TABLE prod REPLACE PARTITION 'fr' FROM staging") // restatement
      x("ALTER TABLE prod DETACH PARTITION 'de'")               // invisible...
      x("ALTER TABLE prod ATTACH PARTITION 'de'")               // ...and back
      x("ALTER TABLE prod MOVE PARTITION 'en' TO TABLE archive")
      x("""SELECT 'archive' AS tbl, lang, count(*) AS docs,
                  CAST(sum(n_chars) AS BIGINT) AS chars
           FROM archive GROUP BY lang
           UNION ALL
           SELECT 'prod' AS tbl, lang, count(*) AS docs,
                  CAST(sum(n_chars) AS BIGINT) AS chars
           FROM prod GROUP BY lang
           ORDER BY tbl, lang""")
    }, Some("""
      SELECT 'archive' AS tbl, lang, count(*) AS docs,
             CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents WHERE lang = 'en' GROUP BY lang
      UNION ALL
      SELECT 'prod' AS tbl, lang, count(*) AS docs,
             CAST(sum(CASE WHEN lang = 'fr' THEN n_chars + 1000000
                           ELSE n_chars END) AS BIGINT) AS chars
      FROM documents WHERE lang <> 'en' GROUP BY lang
      ORDER BY tbl, lang""")),

    // ---- q242: OPTIMIZE ... DEDUPLICATE ------------------------------------
    // CH's physical exact-duplicate drop: a double-inserted corpus
    // collapses to set semantics; the BY form then collapses near-dups
    // per key keeping the lexicographically-least remaining tuple
    // (deterministic where CH keeps an arbitrary row — documented).
    QueryDef("q242_optimize_deduplicate", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q242").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE t (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id""")
      x("INSERT INTO t SELECT doc_id, lang, n_chars FROM documents")
      x("INSERT INTO t SELECT doc_id, lang, n_chars FROM documents")
      x("OPTIMIZE TABLE t DEDUPLICATE") // exact dups -> one copy
      x("INSERT INTO t SELECT doc_id, lang, n_chars + 5 FROM documents")
      x("OPTIMIZE TABLE t DEDUPLICATE BY (doc_id)") // keeps min (lang, n_chars)
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM t GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY lang ORDER BY lang"""))
  )

  /** q239's self-query wire payload: the filter runs over the PATCHED
    * n_chars (only lightweight-updated rows can clear 10000).
    */
  private val q239Wire =
    """```json
      |{
      |    "query": "vector search over mutated tables",
      |    "filter": "and(eq(\"lang\", \"en\"), gt(\"n_chars\", 10200))"
      |}
      |```""".stripMargin
}
