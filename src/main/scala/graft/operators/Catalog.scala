package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table lifecycle facade: the ReplacingMergeTree/MergeTree semantics of
  * the reference's six tables (SURVEY.md §1.2, §2.1 S5/S6/S8/S9) on plain
  * parquet.
  *
  *   - upsert    = append-only write; readers apply last-writer-wins
  *     compaction (`ENGINE=ReplacingMergeTree ORDER BY id`,
  *     `app/backend/constants/myscale_tables.py:37,65` — MyScale also
  *     dedups at read/merge time, not at insert).
  *   - delete    = anti-join rewrite (`DELETE FROM ... WHERE`,
  *     `app/backend/chat_bot/private_knowledge_base.py:93-99`).
  *   - compact() = materialize the compaction view and truncate history
  *     (the explicit OPTIMIZE analog).
  *
  * The version column is caller-supplied (ingest timestamp / batch id) so
  * compaction is deterministic; SURVEY §7 "what's hard" notes the
  * consistency trap — always read through [[read]], never raw parquet.
  *
  * At scale: writes partition by the natural partition column when given
  * (`PARTITION BY session_id` analog, `tools.py:74-78`) so per-key reads
  * and deletes prune partitions instead of scanning the table.
  */
final case class Catalog(spark: SparkSession, root: String) {

  private def path(table: String) = s"$root/$table"

  private def opts(table: String) =
    Catalog.writeOptions.getOrElse(path(table), Map.empty[String, String])

  def create(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").options(opts(table))
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(table))
    invalidateProjections(table)
  }

  /** Append rows. `partitionBy` (the table's declared layout) must be
    * passed for partitioned tables whose directories may not exist yet —
    * an empty partitioned create writes no `col=value` dirs, so layout
    * detection alone would write a broken mixed (flat + partitioned)
    * structure; when omitted, the on-disk layout governs.
    */
  def append(table: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Unit = {
    val parts = if (partitionBy.nonEmpty) partitionBy else partitionColsOf(table)
    val w = df.write.mode("append").options(opts(table))
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path(table))
    invalidateProjections(table)
  }

  /** Every mutation drops projections registered over the table path:
    * a define-time rollup snapshot must never serve aggregates of a
    * base that changed under it (SURVEY §14 item 2 — the caller
    * re-defines, or maintains a MatView whose insert path stays fresh).
    */
  private def invalidateProjections(table: String): Unit =
    org.apache.spark.sql.graft.ProjectionCatalog.invalidate(path(table))

  /** Last-writer-wins view over the append history. Deletion masks apply
    * BEFORE the window: a lightweight-deleted newest version must not win
    * — the surviving older version resurfaces, exactly what CH's FINAL
    * read does once `_row_exists` filters the masked row out of the merge.
    */
  def read(table: String, key: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(desc(versionCol))
    readRaw(table)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  def readRaw(table: String): DataFrame =
    // sidecar-free fast path: referencing `_metadata` forces the scan to
    // materialize row indices even after a drop (Catalyst keeps the
    // generated columns), so clean tables — the overwhelmingly common
    // case — must never pay it (MaskSpec pins the plan)
    if (!hasDeletes(table) && !hasPatches(table)) spark.read.parquet(path(table))
    else readTagged(table).drop(Catalog.FileCol, Catalog.PosCol)

  /** Raw scan with the physical row identity (file path, row position)
    * attached, deletion masks anti-joined away and outstanding update
    * patches applied — the one source every read AND every mutation
    * predicate evaluates against (a `DELETE WHERE status = 'closed'`
    * must see a status a lightweight update patched in).
    */
  private def readTagged(table: String): DataFrame = {
    val scan = spark.read.parquet(path(table))
      .withColumn(Catalog.FileCol, col("_metadata.file_path"))
      .withColumn(Catalog.PosCol, col("_metadata.row_index"))
    applyPatches(table, applyMask(table, scan))
  }

  // ---- lightweight deletes (deletion-vector mask sidecar) ---------------

  private def deletesDir(table: String) = path(table) + "/_deletes"

  /** True when the table carries deletion-mask entries. */
  def hasDeletes(table: String): Boolean = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val d = Paths.get(deletesDir(table))
    Files.isDirectory(d) && Files.walk(d).iterator().asScala.exists(p =>
      Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
  }

  /** ClickHouse lightweight `DELETE FROM t WHERE p` semantics: record the
    * matching rows' (file, row position) in a `_deletes` mask sidecar
    * instead of rewriting data parts — CH writes a `_row_exists` mask
    * column with the same effect. Cost: one scan to FIND matches plus
    * O(matches) mask bytes WRITTEN; zero data bytes rewritten, so a
    * high-QPS delete workload inside one partition never pays a partition
    * rewrite (MaskSoak measures the gap vs the pruned rewrite). Every
    * read path applies the mask via a broadcast hash LEFT ANTI join on
    * (file, pos) — the mask side is O(deleted rows), the cost CH pays
    * too. Masks accumulate until a heavy rewrite of the same rows
    * materializes them (OPTIMIZE / compact / ALTER mutations — CH: until
    * the part merges). The sidecar directory is `_`-prefixed, which
    * Spark's file listing and partition discovery skip, so it can never
    * be read as data.
    */
  def deleteWhereLight(table: String, cond: Column): Unit = {
    val hits = readTagged(table).filter(cond).select(
      col(Catalog.FileCol).as("file"), col(Catalog.PosCol).as("pos"))
    hits.write.mode("append").parquet(deletesDir(table))
    invalidateProjections(table)
  }

  /** Anti-join a tagged scan against the table's mask sidecar. */
  private def applyMask(table: String, scan: DataFrame): DataFrame =
    if (!hasDeletes(table)) scan
    else {
      val m = spark.read.parquet(deletesDir(table))
        .select(col("file").as(Catalog.FileCol), col("pos").as(Catalog.PosCol))
      scan.join(broadcast(m), Seq(Catalog.FileCol, Catalog.PosCol), "left_anti")
    }

  // ---- lightweight updates (patch-part sidecar) --------------------------

  private def patchesDir(table: String) = path(table) + "/_patches"

  /** True when the table carries outstanding update patches. */
  def hasPatches(table: String): Boolean = patchBatches(table).nonEmpty

  /** Outstanding patch batch directories, in application order. */
  private def patchBatches(table: String): Seq[java.nio.file.Path] = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val d = Paths.get(patchesDir(table))
    if (!Files.isDirectory(d)) Nil
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("seq="))
        .toSeq.sortBy(_.getFileName.toString.stripPrefix("seq=").toLong)
      finally s.close()
    }
  }

  /** ClickHouse lightweight `UPDATE t SET a = e WHERE p` (25.x "patch
    * parts"): materialize the assignments for the MATCHING rows into a
    * `_patches/seq=N` sidecar batch — O(matches) written, zero data
    * bytes rewritten — applied at read time as one broadcast join per
    * outstanding batch in sequence order (CH reads pay the same
    * patch-merge until the part merges; OPTIMIZE and heavy mutations
    * fold patches in here too). RHS expressions see the CURRENT row
    * (masks + earlier patches applied), values are cast to the column's
    * declared type at write. Partition-column assignments are rejected:
    * reads prune by directory BEFORE patches apply, so a patched
    * partition value would serve wrong prunes — use the heavy
    * [[updateWhere]] (which CH also demands for key columns).
    */
  def updateWhereLight(table: String, cond: Column,
      assignments: Map[String, Column]): Unit = {
    require(assignments.nonEmpty, "lightweight update needs assignments")
    val parts = partitionColsOf(table)
    val hit = parts.filter(assignments.contains)
    require(hit.isEmpty,
      s"lightweight update cannot assign partition column(s) " +
        s"${hit.mkString(", ")} — use the heavy updateWhere rewrite")
    val cur = readTagged(table)
    val hits = cur.filter(cond).select(
      col(Catalog.FileCol).as("file") +: col(Catalog.PosCol).as("pos") +:
        assignments.toSeq.sortBy(_._1).map { case (c, v) =>
          v.cast(cur.schema(c).dataType).as(c)
        }: _*)
    val seq = patchBatches(table).lastOption
      .map(_.getFileName.toString.stripPrefix("seq=").toLong + 1).getOrElse(0L)
    hits.write.mode("overwrite").parquet(s"${patchesDir(table)}/seq=$seq")
    invalidateProjections(table)
  }

  /** Apply outstanding patch batches in sequence order: one broadcast
    * LEFT join per batch on (file, pos), assigned columns replaced where
    * the batch hits (a patch may legitimately set NULL — replacement is
    * hit-gated, never coalesce). Later batches overwrite earlier ones on
    * the rows/columns they share, which is exactly sequential
    * application because batch values are MATERIALIZED at write time.
    */
  private def applyPatches(table: String, df0: DataFrame): DataFrame =
    patchBatches(table).foldLeft(df0) { (df, dir) =>
      val p = spark.read.parquet(dir.toString)
      val assigned = p.columns.filterNot(c => c == "file" || c == "pos").toSeq
      val pr = p.select(
        col("file").as(Catalog.FileCol) +: col("pos").as(Catalog.PosCol) +:
          lit(true).as("__patch_hit") +:
          assigned.map(c => col(c).as(s"__patch_$c")): _*)
      df.join(broadcast(pr), Seq(Catalog.FileCol, Catalog.PosCol), "left")
        .select(df.columns.toIndexedSeq.map { c =>
          if (assigned.contains(c))
            when(col("__patch_hit"), col(s"__patch_$c")).otherwise(col(c)).as(c)
          else col(c)
        }: _*)
    }

  /** Drop mask and patch entries pointing into rewritten partition
    * directories: the rewrite read through both sidecars, so those
    * entries are applied, and the fresh files carry new UUID names a
    * stale entry can never match — this is sidecar hygiene, not
    * correctness. Entries for untouched partitions stay live.
    */
  private def dropSidecarsUnder(table: String, dirs: Seq[String]): Unit =
    if (dirs.nonEmpty) {
      import java.nio.file.Paths
      val gone = !dirs.map(d => col("file").contains(s"/$d/")).reduce(_ || _)
      if (hasDeletes(table)) {
        val keep = spark.read.parquet(deletesDir(table)).filter(gone)
        if (keep.isEmpty) rmTree(Paths.get(deletesDir(table)))
        else {
          val tmp = path(table) + "__mask_tmp"
          keep.write.mode("overwrite").parquet(tmp)
          replaceDir(tmp, deletesDir(table))
        }
      }
      patchBatches(table).foreach { b =>
        val keep = spark.read.parquet(b.toString).filter(gone)
        if (keep.isEmpty) rmTree(b)
        else {
          val tmp = path(table) + "__patch_tmp"
          keep.write.mode("overwrite").parquet(tmp)
          replaceDir(tmp, b.toString)
        }
      }
      if (hasPatchDirButNoBatches(table))
        rmTree(Paths.get(patchesDir(table)))
    }

  private def hasPatchDirButNoBatches(table: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(patchesDir(table))) &&
      patchBatches(table).isEmpty

  /** Partition columns of a table as laid out on disk (nested
    * `col=value` directory levels, outermost first). Rewrite paths
    * ([[deleteWhere]]/[[updateWhere]]/[[compact]]) re-apply this layout
    * so a mutation never silently flattens a partitioned table — which
    * would make later [[dropPartition]] retention a no-op (r9 ADVICE).
    */
  private def partitionColsOf(table: String): Seq[String] = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    def level(dir: Path): Option[(String, Path)] =
      if (!Files.isDirectory(dir)) None
      else Files.list(dir).iterator().asScala
        .find(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
        .map(p => (p.getFileName.toString.split("=", 2)(0), p))
    Iterator.unfold(Paths.get(path(table))) { d =>
      level(d).map { case (c, next) => (c, next) }
    }.toSeq
  }

  /** Full-table rewrite-and-swap. The swap removes the old table dir
    * INCLUDING any `_deletes` mask sidecar — callers always derive `df`
    * from a masked read, so the swap is also the mask materialization
    * point (the CH merge that folds `_row_exists` into the part).
    */
  private def writeReplacing(table: String, df: DataFrame): Unit = {
    val parts = partitionColsOf(table)
    val tmp = path(table) + "__tmp"
    val w = df.write.mode("overwrite").options(opts(table))
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(tmp)
    replaceDir(tmp, path(table))
    invalidateProjections(table)
  }

  /** Partition-pruned mutation core: rewrite ONLY the leaf partition
    * directories that contain matching rows — every other partition's
    * files are untouched on disk (CH mutations have the same property:
    * parts without matches are never rewritten). Works on ANY partition
    * depth (single `day=` or composite `day=/lang=` retention layouts —
    * the affected unit is the LEAF directory, i.e. one value tuple). At
    * 100 TB this is the difference between a mutation costing O(matched
    * leaves) and O(table). Falls back to the full keep-complement rewrite
    * for unpartitioned tables and for partition values whose directory
    * encoding is non-trivial (escaped characters, nulls) — correctness
    * first, pruning where it's provably the same bytes.
    */
  private def mutatePruned(table: String, cond: Column)
      (transform: DataFrame => DataFrame): Unit = {
    import java.nio.file._
    val parts = partitionColsOf(table)
    // masked read everywhere: a heavy mutation must see the net state the
    // lightweight deletes established (and its rewrite materializes them)
    val full = () => writeReplacing(table, transform(readRaw(table)))
    if (parts.isEmpty) { full(); return }
    val cur = readRaw(table)
    // the affected-leaf list is bounded by the partition count — small by
    // the same argument that makes partitioning useful
    val affected: Array[Seq[Any]] = cur.filter(cond)
      .select(parts.map(col): _*).distinct()
      .collect().map(r => parts.indices.map(r.get))
    if (affected.isEmpty) return // no matches: zero bytes rewritten
    val safe = affected.forall(_.forall(v => v != null && v.toString.nonEmpty &&
      v.toString.forall(ch => ch.isLetterOrDigit || ch == '-' || ch == '_' ||
        ch == '.')))
    if (!safe) { full(); return }
    val dirOf = (vs: Seq[Any]) =>
      parts.zip(vs).map { case (c, v) => s"$c=${v.toString}" }.mkString("/")
    val existing = affected.filter(vs =>
      Files.exists(Paths.get(path(table), dirOf(vs))))
    if (existing.length != affected.length) { full(); return } // unexpected layout
    val slice = cur.filter(affected.map(vs =>
      parts.zip(vs).map { case (c, v) => col(c) === lit(v) }
        .reduce(_ && _)).reduce(_ || _))
    val out = transform(slice)
    val tmp = path(table) + "__mut"
    out.write.mode("overwrite").options(opts(table))
      .partitionBy(parts: _*).parquet(tmp)
    affected.foreach { vs =>
      val src = Paths.get(tmp, dirOf(vs))
      val dst = Paths.get(path(table), dirOf(vs))
      if (Files.exists(src)) replaceDir(src.toString, dst.toString)
      else { // every row of this leaf was deleted
        rmTree(dst)
        // an ancestor left empty would break later layout detection
        // (partitionColsOf descends the first `col=` child it finds)
        dropEmptyAncestors(dst.getParent, Paths.get(path(table)))
      }
    }
    rmTree(Paths.get(tmp))
    dropSidecarsUnder(table, affected.map(dirOf).toSeq)
    invalidateProjections(table)
  }

  private def dropEmptyAncestors(from: java.nio.file.Path,
      stopAt: java.nio.file.Path): Unit = {
    import java.nio.file._
    var d = from
    while (d != null && d.startsWith(stopAt) && d != stopAt &&
        Files.isDirectory(d) && {
          val s = Files.list(d)
          try !s.iterator().hasNext finally s.close()
        }) {
      Files.delete(d)
      d = d.getParent
    }
  }

  /** DELETE WHERE cond: keep-complement rewrite of the AFFECTED
    * partitions only (see [[mutatePruned]]).
    */
  def deleteWhere(table: String, cond: Column): Unit =
    mutatePruned(table, cond)(_.filter(!cond))

  /** ClickHouse `ALTER TABLE .. UPDATE col = expr WHERE cond` (a
    * "mutation"): rewrite matching rows in place, leave the rest
    * untouched. Same rewrite-the-parts shape as [[deleteWhere]] — CH
    * mutations also rewrite whole data parts rather than touching rows;
    * at scale a partition-pruned `cond` bounds the rewrite to the parts
    * it matches.
    */
  def updateWhere(table: String, cond: Column,
      assignments: Map[String, Column]): Unit = {
    // one SELECT so every RHS sees the OLD row (CH mutation semantics,
    // even when one assignment references another updated column)
    def apply(cur: DataFrame): DataFrame =
      cur.select(cur.columns.toIndexedSeq.map { c =>
        assignments.get(c)
          .map(v => when(cond, v).otherwise(col(c)).as(c))
          .getOrElse(col(c))
      }: _*)
    // an assignment that rewrites the PARTITION column moves rows across
    // directories — the pruned per-directory swap cannot express that,
    // so it takes the full rewrite (CH outright forbids mutating key
    // columns; ChDdl rejects it at the statement surface)
    if (partitionColsOf(table).exists(assignments.contains))
      writeReplacing(table, apply(readRaw(table)))
    else mutatePruned(table, cond)(apply)
  }

  /** ClickHouse `TTL <tsCol> + INTERVAL n <unit>` row expiry: drop rows
    * whose ts is older than `now - ttl`. CH applies TTL at merge time;
    * graft applies it as an explicit maintenance pass (the same
    * rewrite-the-parts shape as [[deleteWhere]]). `now` is
    * caller-supplied so expiry is deterministic and testable — a
    * scheduler would pass the wall clock. At scale a table partitioned
    * by day makes this pure partition drops.
    */
  def applyTtl(table: String, tsCol: String, ttl: Column, now: Column): Unit =
    deleteWhere(table, col(tsCol) < now - ttl)

  /** Materialize compaction (OPTIMIZE analog). */
  def compact(table: String, key: Seq[String], versionCol: String): Unit =
    writeReplacing(table, read(table, key, versionCol))

  /** Replace a table's contents with a frame DERIVED FROM ITSELF
    * (write-to-tmp-then-swap — reading and overwriting the same parquet
    * path in one job is undefined in Spark). The engine-specific merge
    * compactions use this: [[compact]] is the replacing form;
    * [[graft.operators.ChDdl]]'s SummingMergeTree OPTIMIZE passes its
    * grouped-sum view here.
    */
  def replaceContents(table: String, df: DataFrame): Unit =
    writeReplacing(table, df)

  /** ClickHouse `ALTER TABLE .. DROP PARTITION` on a table created with
    * `partitionBy`: remove one partition directory outright — no scan,
    * no rewrite, the O(1) bulk-delete that makes date-partitioned
    * retention free at 100 TB (vs deleteWhere's full-table rewrite).
    */
  def dropPartition(table: String, partCol: String, value: String): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    // loud on layout mismatch (r9 ADVICE): a table not partitioned by
    // partCol means retention would silently delete nothing.
    require(partitionColsOf(table).headOption.contains(partCol),
      s"table '$table' is not partitioned by '$partCol' " +
      s"(on-disk layout: ${partitionColsOf(table).mkString("/")}) — " +
      "dropPartition would be a silent no-op")
    val dir = Paths.get(path(table), s"$partCol=$value")
    require(dir.normalize.startsWith(Paths.get(path(table)).normalize),
      s"partition escapes table dir: $dir")
    if (Files.exists(dir)) {
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      // sidecar hygiene: entries under the dropped directory are applied
      // by definition (the rows are gone) — remove them so a later
      // ATTACH into the same partition can never meet a stale entry
      dropSidecarsUnder(table, Seq(s"$partCol=$value"))
      invalidateProjections(table)
    }
  }

  /** ClickHouse `system.parts` analog: the physical parts (parquet
    * files) behind each table in this catalog — name, bytes, mtime —
    * as a DataFrame. Pure driver-side FS listing (parts counts are
    * what an operator checks before/after compaction; cf. CH's
    * `SELECT ... FROM system.parts WHERE active`).
    */
  def parts(): DataFrame = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val rootPath = Paths.get(root)
    val rows: Seq[(String, String, String, Long, java.sql.Timestamp)] =
      if (!Files.isDirectory(rootPath)) Nil
      else Files.list(rootPath).iterator().asScala.filter(Files.isDirectory(_))
        .flatMap { t =>
          Files.walk(t).iterator().asScala
            .filter(p => Files.isRegularFile(p) &&
              p.getFileName.toString.endsWith(".parquet") &&
              // deletion-mask sidecars are mutation state, not parts (CH
              // surfaces mutations in system.mutations, not system.parts)
              !rootPath.relativize(p).toString.split('/').exists(_.startsWith("_")))
            .map { p =>
              val rel = rootPath.relativize(p).toString
              // CH system.parts carries the part's partition id: here the
              // `col=value[/...]` directory chain above the file
              val partition = t.relativize(p).iterator().asScala
                .map(_.toString).filter(_.contains("=")).mkString("/")
              (t.getFileName.toString, rel, partition, Files.size(p),
                new java.sql.Timestamp(Files.getLastModifiedTime(p).toMillis))
            }
        }.toSeq
    rows.toDF("table", "part_name", "partition", "bytes", "modified")
  }

  // ---- partition manipulation (CH ALTER ... PARTITION family) -----------
  // All O(directory move/copy) — never a data rewrite. That is the point
  // at 100 TB: a restatement (recompute one day in staging, swap it into
  // prod) costs metadata, and CH operators lean on exactly these.

  /** First-level partition directory of `table` for `value`. The caller
    * supplies the DECLARED partition column (an empty partitioned table
    * has no `col=value` dirs to detect — the known empty-create trap);
    * when directories DO exist they must agree with it.
    */
  private def partitionDir(table: String, partCol: String,
      value: String): java.nio.file.Path = {
    import java.nio.file._
    val onDisk = partitionColsOf(table)
    require(onDisk.isEmpty || onDisk.head == partCol,
      s"table '$table' is laid out by '${onDisk.mkString("/")}', " +
        s"not '$partCol'")
    require(value.nonEmpty && value.forall(ch => ch.isLetterOrDigit ||
      ch == '-' || ch == '_' || ch == '.'),
      s"partition value '$value' has a non-trivial directory encoding")
    val dir = Paths.get(path(table), s"$partCol=$value")
    require(dir.normalize.startsWith(Paths.get(path(table)).normalize),
      s"partition escapes table dir: $dir")
    dir
  }

  /** Partition ops require NO outstanding lightweight mutations touching
    * the partition: a mask/patch references files by path, and a moved or
    * detached file would escape it — deleted rows resurfacing in the
    * destination. CH has the same rule in time form (mutations must
    * finish before partition manipulation); here the fix is explicit:
    * OPTIMIZE first (folds the sidecars), then move.
    */
  private def requireNoSidecarUnder(table: String, partCol: String,
      value: String): Unit = {
    val seg = s"/$partCol=$value/"
    def hits(df: DataFrame) = !df.filter(col("file").contains(seg)).isEmpty
    val masked = hasDeletes(table) &&
      hits(spark.read.parquet(deletesDir(table)))
    val patched = patchBatches(table)
      .exists(b => hits(spark.read.parquet(b.toString)))
    require(!masked && !patched,
      s"partition '$value' of '$table' has outstanding lightweight " +
        "mutations — OPTIMIZE the table first, then manipulate partitions")
  }

  private def detachedDir(table: String) = path(table) + "/_detached"

  /** `ALTER TABLE t DETACH PARTITION v`: move the directory under the
    * `_detached` area — invisible to every read (underscore-prefixed),
    * re-attachable. */
  def detachPartition(table: String, partCol: String, value: String): Unit = {
    import java.nio.file._
    val src = partitionDir(table, partCol, value)
    require(Files.isDirectory(src), s"no partition '$value' on '$table'")
    requireNoSidecarUnder(table, partCol, value)
    Files.createDirectories(Paths.get(detachedDir(table)))
    Files.move(src, Paths.get(detachedDir(table), src.getFileName.toString),
      StandardCopyOption.ATOMIC_MOVE)
    invalidateProjections(table)
  }

  /** `ALTER TABLE t ATTACH PARTITION v`: bring a detached partition back. */
  def attachPartition(table: String, partCol: String, value: String): Unit = {
    import java.nio.file._
    val dst = partitionDir(table, partCol, value)
    val src = Paths.get(detachedDir(table), dst.getFileName.toString)
    require(Files.isDirectory(src),
      s"no detached partition '$value' on '$table'")
    require(!Files.exists(dst),
      s"partition '$value' already exists on '$table' — DROP it first")
    Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
    invalidateProjections(table)
  }

  /** `ALTER TABLE dst ATTACH|REPLACE PARTITION v FROM src`: COPY the
    * partition from `src` (which stays intact — CH semantics); REPLACE
    * first drops dst's current directory, ATTACH requires dst not to
    * have one. */
  def attachPartitionFrom(dst: String, src: String, partCol: String,
      value: String, replace: Boolean): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    requireNoSidecarUnder(src, partCol, value)
    // the DESTINATION guard closes a repeat-copy hazard: a second copy
    // from the same source re-creates the same file NAMES, which stale
    // dst-side mask/patch entries (from mutations between the copies)
    // would wrongly match — deleted rows must never resurface silently
    requireNoSidecarUnder(dst, partCol, value)
    val from = partitionDir(src, partCol, value)
    require(Files.isDirectory(from), s"no partition '$value' on '$src'")
    val to = partitionDir(dst, partCol, value)
    if (replace) rmTree(to)
    else require(!Files.exists(to),
      s"partition '$value' already exists on '$dst' — use REPLACE")
    Files.walk(from).iterator().asScala.toSeq.foreach { p =>
      val rel = from.relativize(p)
      val t = to.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
    invalidateProjections(dst)
  }

  /** `ALTER TABLE src MOVE PARTITION v TO TABLE dst`: the directory
    * changes tables — removed from `src`, appearing in `dst`. */
  def movePartitionTo(src: String, dst: String, partCol: String,
      value: String): Unit = {
    import java.nio.file._
    requireNoSidecarUnder(src, partCol, value)
    requireNoSidecarUnder(dst, partCol, value) // see attachPartitionFrom
    val from = partitionDir(src, partCol, value)
    require(Files.isDirectory(from), s"no partition '$value' on '$src'")
    val to = partitionDir(dst, partCol, value)
    require(!Files.exists(to),
      s"partition '$value' already exists on '$dst' — DROP or REPLACE it")
    Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
    invalidateProjections(src)
    invalidateProjections(dst)
  }

  /** ClickHouse `OPTIMIZE TABLE t DEDUPLICATE [BY (cols)]`: drop exact
    * duplicate rows physically. Full-row form is pure set semantics;
    * with a BY subset CH keeps an ARBITRARY row per key — graft keeps
    * the lexicographically-least remaining tuple (a deterministic,
    * oracle-able refinement; documented divergence).
    */
  def dedupMerge(table: String, by: Seq[String],
      dropCols: Seq[String] = Nil): Unit = {
    // dropCols: internal bookkeeping columns (ChDdl's implicit insert
    // sequence) that must count neither as identity nor as payload —
    // they are dropped from the rewritten table (absence is handled by
    // every reader/insert path)
    val cur = dropCols.foldLeft(readRaw(table))(_ drop _)
    val out =
      if (by.isEmpty) cur.dropDuplicates()
      else {
        val rest = cur.columns.filterNot(by.contains).toSeq
        require(rest.nonEmpty, "DEDUPLICATE BY must leave at least one column")
        cur.groupBy(by.map(col): _*)
          .agg(min(struct(rest.map(col): _*)).as("__rest"))
          .select(cur.columns.toIndexedSeq.map { c =>
            if (by.contains(c)) col(c) else col(s"__rest.$c").as(c)
          }: _*)
      }
    writeReplacing(table, out)
  }

  /** ClickHouse `KILL MUTATION` analog for the lightweight sidecars:
    * drop the OUTSTANDING (unmerged) deletion masks and update patches of
    * a table, reverting their effect — exactly what CH's KILL does to a
    * mutation that has not finished materializing. Data files were never
    * touched, so the revert is two directory removals. Once OPTIMIZE or
    * a heavy mutation has folded a sidecar in, it is gone from
    * `system.mutations` and can no longer be killed (CH: a finished
    * mutation is not killable either).
    */
  def killMutations(table: String): Unit = {
    import java.nio.file.Paths
    rmTree(Paths.get(deletesDir(table)))
    rmTree(Paths.get(patchesDir(table)))
    invalidateProjections(table)
  }

  /** ClickHouse `system.detached_parts` analog: partitions parked by
    * [[detachPartition]], with their sizes — what an operator checks
    * before ATTACH or cleanup.
    */
  def detachedParts(): DataFrame = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val rootPath = Paths.get(root)
    val rows: Seq[(String, String, Long)] =
      if (!Files.isDirectory(rootPath)) Nil
      else Files.list(rootPath).iterator().asScala.filter(Files.isDirectory(_))
        .flatMap { t =>
          val det = t.resolve("_detached")
          if (!Files.isDirectory(det)) Nil
          else Files.list(det).iterator().asScala.filter(Files.isDirectory(_))
            .map { p =>
              val bytes = Files.walk(p).iterator().asScala
                .filter(Files.isRegularFile(_)).map(Files.size).sum
              (t.getFileName.toString, p.getFileName.toString, bytes)
            }.toSeq
        }.toSeq.sortBy(r => (r._1, r._2))
    rows.toDF("table", "partition", "bytes")
  }

  /** ClickHouse `system.mutations` analog: the OUTSTANDING lightweight
    * mutation state per table — deletion-mask and update-patch sidecars
    * (kind, batches, rows, bytes). CH rows carry `is_done`; here a row
    * exists only while undone — OPTIMIZE and heavy mutations fold the
    * sidecars in and the rows disappear, which is the signal an operator
    * polls for.
    */
  def mutations(): DataFrame = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val rootPath = Paths.get(root)
    def bytes(p: Path): Long = Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
    val rows: Seq[(String, String, Long, Long, Long)] =
      if (!Files.isDirectory(rootPath)) Nil
      else Files.list(rootPath).iterator().asScala.filter(Files.isDirectory(_))
        .flatMap { t =>
          val table = t.getFileName.toString
          val del =
            if (!hasDeletes(table)) Nil
            else {
              val d = Paths.get(deletesDir(table))
              Seq((table, "delete_mask", 1L,
                spark.read.parquet(d.toString).count(), bytes(d)))
            }
          val pat = patchBatches(table) match {
            case Nil => Nil
            case bs => Seq((table, "update_patch", bs.size.toLong,
              bs.map(b => spark.read.parquet(b.toString).count()).sum,
              bytes(Paths.get(patchesDir(table)))))
          }
          del ++ pat
        }.toSeq.sortBy(r => (r._1, r._2))
    rows.toDF("table", "kind", "batches", "rows", "bytes")
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  private def replaceDir(from: String, to: String): Unit = {
    import java.nio.file._
    rmTree(Paths.get(to))
    Files.move(Paths.get(from), Paths.get(to), StandardCopyOption.ATOMIC_MOVE)
  }
}

object Catalog {
  /** Internal row-identity columns threaded through tagged reads. */
  private[operators] val FileCol = "__graft_file"
  private[operators] val PosCol = "__graft_pos"

  /** Per-table-path parquet writer options — the CH data-skipping-index
    * analog made physical ([[graft.operators.ChDdl]] registers
    * `parquet.bloom.filter.enabled#col` / `expected.ndv#col` here from
    * `INDEX ... TYPE bloom_filter` DDL; PLANS "Data skipping" has the
    * measured 5.3× row-group pruning). EVERY write path consults the
    * registry — including the deleteWhere/updateWhere/compact rewrites —
    * so a mutation never silently drops the table's skip indexes.
    */
  private[operators] val writeOptions =
    new scala.collection.concurrent.TrieMap[String, Map[String, String]]

  def registerWriteOptions(tablePath: String, options: Map[String, String]): Unit =
    if (options.nonEmpty) writeOptions.put(tablePath, options)
    else writeOptions.remove(tablePath)
}
