package graft.queries

import graft.Tables

/** Round-15 gated queries: the manifest's two guarantees as end-to-end
  * statement lifecycles, each hash-exact vs a DuckDB oracle that
  * recomputes the same net state from the base `documents` table.
  *
  *   - q250: the atomic rewrite — after OPTIMIZE, crash-window debris
  *     (fully-written data files a killed rewrite left beside the live
  *     set) must be INVISIBLE to reads. A listing-served engine doubles
  *     every row here; the manifest read is exact.
  *   - q251: manifest maintenance across the whole mutation surface —
  *     lightweight deletes/updates, both sidecar folds, a heavy pruned
  *     mutation and a vacuum, with the final aggregate exact.
  */
object Round15Queries {

  def defs: Seq[QueryDef] = Seq(

    // ---- q250: crash debris is invisible to manifest reads -------------
    QueryDef("q250_manifest_orphan_isolation", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val root = java.nio.file.Files.createTempDirectory("q250").toString
      val cat = graft.operators.Catalog(s, root)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("UPDATE d SET n_chars = n_chars + 7 WHERE doc_id % 5 == 0")
      x("DELETE FROM d WHERE n_chars < 400")
      x("OPTIMIZE TABLE d FINAL") // the flip: folds both sidecars
      // simulate a rewrite killed between its file writes and its
      // commit: fully-formed duplicates of every live file appear
      // beside the originals (fresh names, same bytes)
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val tdir = Paths.get(root, "d")
      Files.walk(tdir).iterator().asScala.toList
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet") &&
          !tdir.relativize(p).toString.split('/').exists(_.startsWith("_")))
        .foreach { p =>
          Files.copy(p, p.resolveSibling(
            "part-orphan-" + p.getFileName.toString.drop(5)))
        }
      // the read must serve the committed set only — exact, not doubled
      x("""SELECT lang, count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      WITH mutated AS (
        SELECT lang,
               CASE WHEN doc_id % 5 = 0 THEN n_chars + 7
                    ELSE n_chars END AS n_chars
        FROM documents),
      net AS (SELECT lang, n_chars FROM mutated WHERE NOT (n_chars < 400))
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM net GROUP BY lang ORDER BY lang""")),

    // ---- q251: maintenance lifecycle under the manifest ----------------
    QueryDef("q251_manifest_maintenance_lifecycle", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val root = java.nio.file.Files.createTempDirectory("q251").toString
      val cat = graft.operators.Catalog(s, root)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      // accumulate sidecar state: two mask epochs, two patch batches
      x("DELETE FROM d WHERE n_chars < 300")
      x("DELETE FROM d WHERE doc_id % 13 == 0")
      x("UPDATE d SET n_chars = n_chars + 1 WHERE doc_id % 7 == 0")
      x("UPDATE d SET n_chars = n_chars + 10 WHERE doc_id % 11 == 0")
      // fold K batches -> 1 and the mask files -> 1 (zero data bytes);
      // both folds recommit the manifest scoped
      cat.compactMask("d")
      cat.compactPatches("d")
      // heavy pruned mutation on top (reads through the folded
      // sidecars, materializes them for the leaves it rewrites)
      x("ALTER TABLE d DELETE WHERE lang = 'de' AND doc_id % 2 == 0")
      // space hygiene: vacuum must be a no-op on reads
      cat.vacuum("d")
      x("""SELECT lang, count(*) AS docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      WITH kept AS (
        SELECT * FROM documents
        WHERE NOT (n_chars < 300) AND NOT (doc_id % 13 = 0)),
      patched AS (
        SELECT lang, doc_id,
               n_chars
                 + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                 + CASE WHEN doc_id % 11 = 0 THEN 10 ELSE 0 END AS n_chars
        FROM kept),
      net AS (
        SELECT lang, n_chars FROM patched
        WHERE NOT (lang = 'de' AND doc_id % 2 = 0))
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM net GROUP BY lang ORDER BY lang"""))
  )
}
