package graft.queries

import graft.Tables

/** Round-13 gated queries: patch-batch compaction, composite-leaf
  * partition manipulation and CLEAR COLUMN — the r12 verdict's runway —
  * each hash-exact vs a DuckDB oracle recomputing the same net state
  * from the base table.
  */
object Round13Queries {

  def defs: Seq[QueryDef] = Seq(

    // ---- q243: patch-batch compaction --------------------------------------
    // The reference updates session metadata every turn
    // (`app/backend/chat_bot/session_manager.py:70-88`): K lightweight
    // UPDATE batches accumulate, costing K read-side joins until a merge.
    // compactPatches folds them into ONE batch with per-column presence
    // flags — "assigned NULL" (patch 3 redacts source to NULL) must stay
    // distinct from "not assigned" (rows patch 3 never touched keep their
    // patched-or-base source). The fold must be invisible: a lightweight
    // DELETE after it still sees the patched values, and the read is
    // gated vs DuckDB chaining the same three updates sequentially.
    QueryDef("q243_patch_compaction", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q243").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64,
           source String) ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars, source FROM documents")
      x("UPDATE d SET n_chars = n_chars + 1000 WHERE doc_id % 5 == 0")
      x("UPDATE d SET source = 'redacted', n_chars = n_chars - 7 WHERE n_chars >= 1800")
      x("UPDATE d SET source = NULL WHERE lang == 'de'")
      cat.compactPatches("d") // 3 outstanding batches -> 1, zero data bytes
      x("DELETE FROM d WHERE n_chars > 2500") // predicate sees the folded patches
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars,
                  count(source) AS srcs, count(DISTINCT source) AS nsrc
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      WITH p1 AS (
        SELECT doc_id, lang, source,
               CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        FROM documents),
      p2 AS (
        SELECT doc_id, lang,
               CASE WHEN n_chars >= 1800 THEN 'redacted' ELSE source END AS source,
               CASE WHEN n_chars >= 1800 THEN n_chars - 7 ELSE n_chars END AS n_chars
        FROM p1),
      p3 AS (
        SELECT doc_id, lang,
               CASE WHEN lang = 'de' THEN NULL ELSE source END AS source, n_chars
        FROM p2)
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars,
             count(source) AS srcs, count(DISTINCT source) AS nsrc
      FROM p3 WHERE NOT (n_chars > 2500)
      GROUP BY lang ORDER BY lang""")),

    // ---- q244: composite-leaf partition manipulation ------------------------
    // The two-axis restatement at 100 TB (day=/lang= here lang=/b=):
    // REPLACE one LEAF from staging (a directory copy — the recompute-
    // one-cell workflow), DETACH/ATTACH round-trip another leaf AND a
    // whole first-level subtree (prefix addressing), MOVE a third leaf
    // out to an archive table. Every op is O(directory); net state of
    // both tables gated vs DuckDB computing it directly.
    QueryDef("q244_composite_partition_ops", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q244").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      for (t <- Seq("prod", "staging", "archive"))
        x(s"""CREATE TABLE $t (doc_id Int64, lang String, b Int64, n_chars Int64)
             ENGINE = MergeTree ORDER BY doc_id PARTITION BY (lang, b)""")
      x("INSERT INTO prod SELECT doc_id, lang, doc_id % 3 AS b, n_chars FROM documents")
      x("""INSERT INTO staging SELECT doc_id, lang, doc_id % 3 AS b, n_chars + 1000000
           FROM documents PREWHERE lang == 'fr' AND doc_id % 3 == 2""")
      x("ALTER TABLE prod REPLACE PARTITION ('fr', '2') FROM staging") // leaf restatement
      x("ALTER TABLE prod DETACH PARTITION ('es', '0')")               // leaf out...
      x("ALTER TABLE prod ATTACH PARTITION ('es', '0')")               // ...and back
      x("ALTER TABLE prod DETACH PARTITION 'de'")                      // whole subtree...
      x("ALTER TABLE prod ATTACH PARTITION 'de'")                      // ...and back
      x("ALTER TABLE prod MOVE PARTITION ('en', '1') TO TABLE archive")
      x("ALTER TABLE prod DROP PARTITION ('zh', '1')")                 // leaf retention
      x("""SELECT 'archive' AS tbl, lang, b, count(*) AS docs,
                  CAST(sum(n_chars) AS BIGINT) AS chars
           FROM archive GROUP BY lang, b
           UNION ALL
           SELECT 'prod' AS tbl, lang, b, count(*) AS docs,
                  CAST(sum(n_chars) AS BIGINT) AS chars
           FROM prod GROUP BY lang, b
           ORDER BY tbl, lang, b""")
    }, Some("""
      WITH base AS (
        SELECT doc_id, lang, doc_id % 3 AS b, n_chars FROM documents)
      SELECT 'archive' AS tbl, lang, b, count(*) AS docs,
             CAST(sum(n_chars) AS BIGINT) AS chars
      FROM base WHERE lang = 'en' AND b = 1 GROUP BY lang, b
      UNION ALL
      SELECT 'prod' AS tbl, lang, b, count(*) AS docs,
             CAST(sum(CASE WHEN lang = 'fr' AND b = 2 THEN n_chars + 1000000
                           ELSE n_chars END) AS BIGINT) AS chars
      FROM base
      WHERE NOT (lang = 'en' AND b = 1) AND NOT (lang = 'zh' AND b = 1)
      GROUP BY lang, b
      ORDER BY tbl, lang, b""")),

    // ---- q245: CLEAR COLUMN IN PARTITION ------------------------------------
    // CH's reset-to-default mutation, partition-scoped: n_chars reverts
    // to its declared DEFAULT (42) in 'en', source (no DEFAULT, not
    // Nullable) to the type zero '' in 'fr', extra (Nullable, no
    // DEFAULT) to NULL in 'de'. Routed through the partition-pruned
    // updateWhere — only the addressed directories rewrite. Oracle:
    // DuckDB recomputes each reset directly.
    QueryDef("q245_clear_column_in_partition", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q245").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64 DEFAULT 42,
           source String, extra Nullable(String))
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("""INSERT INTO d SELECT doc_id, lang, n_chars, source, source AS extra
           FROM documents""")
      x("ALTER TABLE d CLEAR COLUMN n_chars IN PARTITION 'en'")
      x("ALTER TABLE d CLEAR COLUMN source IN PARTITION 'fr'")
      x("ALTER TABLE d CLEAR COLUMN extra IN PARTITION 'de'")
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars,
                  count(DISTINCT source) AS nsrc, count(extra) AS n_extra
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang, count(*) AS docs,
             CAST(sum(CASE WHEN lang = 'en' THEN 42 ELSE n_chars END) AS BIGINT) AS chars,
             count(DISTINCT CASE WHEN lang = 'fr' THEN '' ELSE source END) AS nsrc,
             count(CASE WHEN lang = 'de' THEN NULL ELSE source END) AS n_extra
      FROM documents GROUP BY lang ORDER BY lang""")),

    // ---- q246: scoped lightweight deletes + APPLY DELETED MASK -------------
    // CH's `DELETE FROM t IN PARTITION p WHERE ...` bounds the mask (and
    // the FIND scan) to one partition; `ALTER TABLE t APPLY DELETED MASK
    // [IN PARTITION p]` then materializes masks physically at
    // O(dirty leaves) — the targeted alternative to OPTIMIZE when only
    // the mask read-rent should stop. The read after a partial APPLY
    // must still compose the REMAINING mask; the read after the full
    // APPLY runs the clean fast path. MaskSpec pins the sidecar
    // mechanics (entries gone, untouched leaves byte-identical,
    // all-masked leaves dropped outright).
    QueryDef("q246_apply_deleted_mask", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q246").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("DELETE FROM d IN PARTITION 'en' WHERE n_chars < 600")
      x("DELETE FROM d WHERE doc_id % 10 == 0")
      x("ALTER TABLE d APPLY DELETED MASK IN PARTITION 'en'") // en leaves only
      x("ALTER TABLE d APPLY DELETED MASK")                   // the rest
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents
      WHERE NOT (lang = 'en' AND n_chars < 600) AND NOT (doc_id % 10 = 0)
      GROUP BY lang ORDER BY lang""")),

    // ---- q247: FREEZE / restore lifecycle -----------------------------------
    // The backup workflow CH operators run before risky mutations:
    // FREEZE snapshots one partition into the `_shadow` area, a heavy
    // UPDATE then a DROP PARTITION "corrupt" prod, restoreFrozen copies
    // the snapshot into `_detached`, ATTACH brings the ORIGINAL bytes
    // back, SYSTEM UNFREEZE cleans the backup without touching data.
    // Oracle: the restored table equals the untouched base table.
    QueryDef("q247_freeze_restore", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q247").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("ALTER TABLE d FREEZE PARTITION 'fr' WITH NAME 'b1'")
      x("ALTER TABLE d UPDATE n_chars = 0 WHERE lang == 'fr'") // corruption
      x("ALTER TABLE d DROP PARTITION 'fr'")                   // oops
      cat.restoreFrozen("d", "b1", Seq("lang" -> "fr"))
      x("ALTER TABLE d ATTACH PARTITION 'fr'")
      x("SYSTEM UNFREEZE WITH NAME 'b1'")
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY lang ORDER BY lang"""))
  )
}
