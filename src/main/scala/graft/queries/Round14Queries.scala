package graft.queries

import graft.Tables

/** Round-14 gated queries: backup/parked-subtree survival across the
  * full rewrite-and-swap family — the r13 ADVICE `high` finding made
  * an end-to-end statement lifecycle, each hash-exact vs a DuckDB
  * oracle recomputing the same net state from the base table.
  */
object Round14Queries {

  def defs: Seq[QueryDef] = Seq(

    // ---- q248: FREEZE survives OPTIMIZE --------------------------------
    // The backup-before-risky-mutation workflow with the merge IN THE
    // MIDDLE: FREEZE snapshots 'fr', lightweight mutations accumulate,
    // OPTIMIZE folds them via the full rewrite-and-swap — which must
    // leave the `_shadow` snapshot standing (the documented "physically
    // independent of later mutations" guarantee; r13's swap deleted it
    // here, stranding the operator AFTER the corruption). The restore
    // then proves the snapshot is the PRE-mutation bytes: fr comes back
    // original while every other partition keeps the folded mutations.
    QueryDef("q248_freeze_survives_optimize", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q248").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("ALTER TABLE d FREEZE PARTITION 'fr' WITH NAME 'pre'")
      x("UPDATE d SET n_chars = n_chars + 100000 WHERE doc_id % 2 == 0")
      x("DELETE FROM d WHERE n_chars < 500")
      x("OPTIMIZE TABLE d FINAL")       // swap must NOT destroy _shadow
      x("ALTER TABLE d DROP PARTITION 'fr'") // the "risky" outcome
      cat.restoreFrozen("d", "pre", Seq("lang" -> "fr"))
      x("ALTER TABLE d ATTACH PARTITION 'fr'") // original fr bytes back
      x("SYSTEM UNFREEZE WITH NAME 'pre'")
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      WITH mutated AS (
        SELECT lang,
               CASE WHEN doc_id % 2 = 0 THEN n_chars + 100000
                    ELSE n_chars END AS n_chars
        FROM documents WHERE lang <> 'fr'),
      net AS (
        SELECT lang, n_chars FROM mutated WHERE NOT (n_chars < 500)
        UNION ALL
        SELECT lang, n_chars FROM documents WHERE lang = 'fr')
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM net GROUP BY lang ORDER BY lang""")),

    // ---- q249: DETACH survives OPTIMIZE ---------------------------------
    // Parking a partition exempts it from the mutation epoch running
    // while it is parked: 'es' detaches, a delete + merge run against
    // the LIVE table only (the swap must leave `_detached` standing —
    // r13's swap deleted the parked bytes outright), ATTACH brings the
    // untouched rows back. Net state: the delete applied everywhere
    // except the parked partition.
    QueryDef("q249_detach_survives_optimize", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q249").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("ALTER TABLE d DETACH PARTITION 'es'")
      x("DELETE FROM d WHERE doc_id % 3 == 0") // 'es' is parked: exempt
      x("OPTIMIZE TABLE d FINAL")       // swap must NOT destroy _detached
      x("ALTER TABLE d ATTACH PARTITION 'es'")
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents
      WHERE lang = 'es' OR doc_id % 3 <> 0
      GROUP BY lang ORDER BY lang"""))
  )
}
