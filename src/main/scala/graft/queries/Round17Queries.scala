package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-17 gated queries: the manifest's ONE-FLIP mutation protocol
  * (optimistic content-atomic seals + write-beside sidecar folds —
  * r16 verdict items 1/2) as an end-to-end lifecycle, hash-exact vs a
  * DuckDB oracle that recomputes the same net state from `documents`.
  *
  * q255 plants every crash-artifact shape the new protocol can mint —
  * BEFORE running a heavy pruned mutation whose fold must flip around
  * all of it:
  *
  *   - an UNSEALED higher-seq snapshot with valid bytes naming a
  *     phantom file — the in-flight/crashed-commit shape; adopting it
  *     (or targeting past it) was the lost-update hole the
  *     ConcurrencySpec hammer caught;
  *   - a staged `.tmp-` claim file — the only artifact a kill inside
  *     the content-atomic CAS can leave;
  *   - an uncommitted mask parquet — a crashed lightweight DELETE's
  *     files, swept by the next mutator entry, never adopted;
  *   - a rogue data parquet INSIDE a live partition directory — a
  *     crashed move-in; manifest-served reads and the move-tracked
  *     flip must never adopt it.
  */
object Round17Queries {

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q255_manifest_flip_lifecycle", (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val root = java.nio.file.Files.createTempDirectory("q255").toString
      val cat = graft.operators.Catalog(s, root)
      val fsOps = graft.operators.FsOps(s)
      cat.create("d", docs, partitionBy = Seq("lang"))
      // live sidecars: a deletion mask and an update patch the heavy
      // mutation's fold must carry through its one-flip commit
      cat.deleteWhereLight("d", col("n_chars") > 900)
      cat.updateWhereLight("d", col("doc_id") % 7 === 0,
        Map("n_chars" -> (col("n_chars") + 1)))
      // ---- crash debris, planted around the API ----------------------
      val man = s"$root/d/_manifest"
      // an unsealed snapshot at a high sequence (valid bytes, phantom
      // content) — the crashed/in-flight commit; readers and the next
      // commit's target must both ignore it
      val bout = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bout)
      gz.write(("graft-manifest 1\nfiles 1\n1\t0\tphantom.parquet\n" +
        "remove 0\nend").getBytes("UTF-8"))
      gz.close()
      fsOps.writeBytes(s"$man/" + f"snap-${424242L}%020d-deadbeef.gz",
        bout.toByteArray)
      // a staged claim from a kill inside the CAS — aged past the
      // in-flight staging floor (a fresh tmp is spared as a possibly
      // concurrent claim mid-link; crash debris is old by the time any
      // real commit's hygiene runs)
      fsOps.writeBytes(s"$man/.tmp-claim-deadbeef", "half".getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$man/.tmp-claim-deadbeef"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 120000L))
      // a crashed lightweight DELETE's uncommitted mask file: entries
      // that would wrongly hide every doc with n_chars = 500
      import s.implicits._
      val committedMask = fsOps.listFiles(s"$root/d/_deletes")
        .map(_._1).filter(_.endsWith(".parquet")).toSet
      docs.filter(col("n_chars") === 500)
        .select(concat(lit(s"file:$root/d/"), lit("x.parquet")).as("file"),
          col("doc_id").as("pos"))
        .write.mode("append").parquet(s"$root/d/_deletes")
      val uncommittedMask = fsOps.listFiles(s"$root/d/_deletes")
        .map(_._1).filter(_.endsWith(".parquet")).toSet -- committedMask
      // a crashed move-in: rogue rows inside a live partition dir
      val lang0 = fsOps.listDirNames(s"$root/d").find(_.startsWith("lang="))
        .getOrElse(sys.error("q255: no partition dirs"))
      Seq((-1L, 999999L)).toDF("doc_id", "n_chars")
        .write.mode("overwrite")
        .parquet(s"$root/d/__rogue")
      fsOps.listFiles(s"$root/d/__rogue").map(_._1)
        .filter(_.endsWith(".parquet")).foreach { f =>
          fsOps.move(f, s"$root/d/$lang0/rogue-crash-orphan.parquet")
        }
      fsOps.rmTree(s"$root/d/__rogue")
      // ---- the heavy pruned mutation: ONE flip around all of it ------
      cat.deleteWhere("d", col("n_chars") < 100)
      // the staged claim was hygiene-swept by the flip's commits
      require(!fsOps.exists(s"$man/.tmp-claim-deadbeef"),
        "q255: staged claim must be swept")
      // the crashed delete's mask files were swept, not adopted
      require(uncommittedMask.forall(!fsOps.exists(_)),
        "q255: uncommitted mask files must be swept, not adopted")
      cat.readRaw("d")
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          sum("n_chars").cast("bigint").as("chars"))
        .orderBy("lang")
    }, Some("""
      WITH visible AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 7 = 0 THEN n_chars + 1
                    ELSE n_chars END AS n_chars
        FROM documents WHERE NOT (n_chars > 900)),
      net AS (SELECT lang, n_chars FROM visible WHERE NOT (n_chars < 100))
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM net GROUP BY lang ORDER BY lang""")),

    // ---- q256: TWO CONCURRENT WRITERS on one table, oracle-exact ------
    // The reference deployment's real shape (docs/self-query.md:88-99):
    // continuous ingest mutating a table while a maintenance job folds
    // its sidecars — at 100 TB those are separate processes. Two
    // Catalog instances (separate manifest caches don't exist — the
    // protocol state lives on the FILESYSTEM, so two instances ARE the
    // two-process shape) run genuinely interleaved statement streams on
    // one table from two threads, every statement wrapped in
    // Optimistic.retryOnConflict. The statements are chosen to COMMUTE
    // (predicates and assigned values derive only from the immutable
    // doc_id), so the net state is interleaving-independent and DuckDB
    // can recompute it exactly — any lost update, double-apply, swept
    // in-flight sidecar, or adopted uncommitted file breaks the hash.
    QueryDef("q256_concurrent_ingest_maintenance", (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val root = java.nio.file.Files.createTempDirectory("q256").toString
      val prevGrace = s.conf.getOption("spark.graft.sidecarSweepGraceMs")
      // concurrent sidecar writers on one table require the sweep
      // grace (Catalog scaladoc — Delta's vacuum-retention posture)
      s.conf.set("spark.graft.sidecarSweepGraceMs", "600000")
      try {
        val writerA = graft.operators.Catalog(s, root) // "ingest"
        val writerB = graft.operators.Catalog(s, root) // "maintenance"
        writerA.create("d", docs, partitionBy = Seq("lang"))
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
        def thread(ops: Seq[() => Unit]) = new Thread(() =>
          try ops.foreach(op =>
            graft.operators.Optimistic.retryOnConflict(attempts = 40)(op()))
          catch { case t: Throwable => errs.add(t) })
        val ta = thread(Seq(
          () => writerA.deleteWhereLight("d", col("doc_id") % 11 === 3),
          () => writerA.updateWhereLight("d", col("doc_id") % 7 === 1,
            Map("n_chars" -> (col("doc_id") % 300))),
          () => writerA.deleteWhereLight("d", col("doc_id") % 13 === 5)))
        val tb = thread(Seq(
          () => writerB.updateWhereLight("d", col("doc_id") % 7 === 0,
            Map("n_chars" -> (col("doc_id") % 500))),
          () => writerB.compactMask("d"),
          () => writerB.compactPatches("d")))
        ta.start(); tb.start(); ta.join(300000); tb.join(300000)
        require(errs.isEmpty, s"q256: writer failed: ${errs.peek()}")
        // a final fold from a THIRD instance proves the landed state is
        // fold-consistent regardless of which maintenance calls raced
        val after = graft.operators.Catalog(s, root)
        after.compactMask("d"); after.compactPatches("d")
        after.readRaw("d")
          .groupBy("lang")
          .agg(count(lit(1)).as("docs"),
            sum("n_chars").cast("bigint").as("chars"))
          .orderBy("lang")
      } finally prevGrace match {
        case Some(v) => s.conf.set("spark.graft.sidecarSweepGraceMs", v)
        case None => s.conf.unset("spark.graft.sidecarSweepGraceMs")
      }
    }, Some("""
      WITH net AS (
        SELECT lang,
               CASE WHEN doc_id % 7 = 0 THEN doc_id % 500
                    WHEN doc_id % 7 = 1 THEN doc_id % 300
                    ELSE n_chars END AS n_chars
        FROM documents
        WHERE NOT (doc_id % 11 = 3) AND NOT (doc_id % 13 = 5))
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM net GROUP BY lang ORDER BY lang"""))
  )
}
