package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-16 gated queries: the side stores' write-beside + pointer-flip
  * commits ([[graft.operators.EpochStore]] — r15 verdict item 1) as
  * end-to-end lifecycles, each hash-exact vs a DuckDB oracle that
  * recomputes the same net state from the base `documents` table.
  *
  *   - q252: the materialized-view partial log across create / insert /
  *     OPTIMIZE-FINAL compactions, with a crashed compact's debris (a
  *     fully-written epoch directory that never got its pointer)
  *     planted mid-lifecycle. A store that resolved by listing would
  *     read the debris; the flip-committed read is exact.
  *   - q253: the MVCC table across create / versioned append / tombstone
  *     delete / compact, same debris plant before the compact.
  */
object Round16Queries {

  def defs: Seq[QueryDef] = Seq(

    // ---- q252: matview partial log under the pointer flip --------------
    QueryDef("q252_matview_flip_lifecycle", (s, dir) => {
      import org.apache.spark.sql.graft.ProjectionCatalog.Measure
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val root = java.nio.file.Files.createTempDirectory("q252").toString
      val mv = graft.operators.MatView.create(s, root, Seq("lang"),
        Seq(Measure("n_chars", None)),
        initial = docs.filter(col("doc_id") % 3 === 0))
      mv.insert(docs.filter(col("doc_id") % 3 === 1))
      // a compact killed between its epoch write and its pointer flip:
      // a fully-formed epoch directory with WRONG contents (here: the
      // first third doubled) and no commit. Resolution must not see it.
      val fsOps = graft.operators.FsOps(s)
      val rogue = f"$root/e${7777L}%020d-deadbeef"
      org.apache.spark.sql.graft.ProjectionCatalog.partialAgg(
        docs.filter(col("doc_id") % 3 === 0), Seq("lang"),
        Seq(Measure("n_chars", None))).write.parquet(rogue)
      mv.compact() // the real flip; sweeps the debris too
      require(!fsOps.isDir(rogue), "q252: compact must sweep crash debris")
      mv.insert(docs.filter(col("doc_id") % 3 === 2))
      mv.read()
        .select(col("lang"), col("cnt").as("docs"),
          col("sum_n_chars").cast("bigint").as("chars"),
          col("min_n_chars").as("lo"), col("max_n_chars").as("hi"))
        .orderBy("lang")
    }, Some("""
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars,
             min(n_chars) AS lo, max(n_chars) AS hi
      FROM documents GROUP BY lang ORDER BY lang""")),

    // ---- q253: MVCC data directory under the pointer flip --------------
    QueryDef("q253_mvcc_flip_lifecycle", (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val root = java.nio.file.Files.createTempDirectory("q253").toString
      val mc = graft.operators.MvccCatalog(s, root)
      mc.create("d", docs, version = 1)
      // versioned update: doc_id % 5 == 0 rows get n_chars + 7 (LWW)
      mc.append("d", docs.filter(col("doc_id") % 5 === 0)
        .withColumn("n_chars", col("n_chars") + 7), version = 2)
      // tombstone delete against the LWW state
      mc.deleteWhere("d", col("n_chars") < 400, Seq("doc_id"), version = 3)
      // a compact killed before its flip: epoch debris with wrong rows
      val rogue = f"$root/d/data/e${7777L}%020d-deadbeef"
      docs.limit(10).withColumn("__v", lit(99L)).write.parquet(rogue)
      // compact = flip; old epoch + debris swept, tombstones folded
      mc.compact("d", Seq("doc_id"), version = 4)
      require(!graft.operators.FsOps(s).isDir(rogue),
        "q253: compact must sweep crash debris")
      mc.read("d", Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          sum("n_chars").cast("bigint").as("chars"))
        .orderBy("lang")
    }, Some("""
      WITH mutated AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 5 = 0 THEN n_chars + 7
                    ELSE n_chars END AS n_chars
        FROM documents),
      net AS (SELECT lang, n_chars FROM mutated WHERE NOT (n_chars < 400))
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM net GROUP BY lang ORDER BY lang"""))
  )
}
