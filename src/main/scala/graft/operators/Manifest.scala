package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Log-structured table manifest: one snapshot file under
  * `<table>/_manifest/` lists every live file of the table (data parts,
  * `_deletes` mask files, `_patches/seq=N` batch files), so a read
  * CONSTRUCTION costs one LIST of the small `_manifest` directory plus
  * a cached parse — O(1) in the table's file count — instead of one
  * recursive LIST of the whole tree (10^2–10^3 paged S3 calls at a
  * 10^5–10^6-file posture; the exact planning pain Delta's `_delta_log`
  * and Iceberg's manifest lists exist to remove, both public designs).
  *
  * Authority contract (the part that has to be stated sharply):
  *
  *   - A table WITH a `_manifest` directory is MANIFEST-AUTHORITATIVE:
  *     readers serve exactly the files the latest snapshot names. A
  *     file present in the tree but absent from the snapshot does not
  *     exist for readers — which is what makes commits atomic (write
  *     files first, then flip) and crash orphans harmless garbage
  *     instead of duplicate rows. The one-writer-per-table contract the
  *     Catalog already states is what external writers break by writing
  *     around the API; [[Catalog.refreshManifest]] is the explicit
  *     reconciliation hatch.
  *   - A table WITHOUT a `_manifest` directory reads through the
  *     filesystem listing exactly as before — the fallback, and the
  *     compatibility mode for tables written by anything else.
  *   - A `_manifest` directory whose snapshots are unreadable is
  *     CORRUPTION and fails loud. Falling back to the listing here
  *     would be unsound: the tree of a manifested table legitimately
  *     carries uncommitted files (crash windows, pre-cleanup states),
  *     and a listing would adopt them as data. Stale/absent → listing;
  *     present-but-broken → error, never a wrong read.
  *
  * Commit protocol (all driver-serialized, like every Catalog
  * mutation):
  *
  *   1. write new files into the tree (fresh UUID names — never
  *      colliding with live ones);
  *   2. COMMIT: write snapshot seq+1 naming the new live set, with
  *      `remove` = files the new state no longer references;
  *   3. only then destroy the `remove` files. A crash before 2 leaves
  *      the old snapshot serving the old state; a crash after 2 leaves
  *      the new state serving, with `remove` as a to-do that
  *      [[Catalog]]'s reconcile pass finishes before the next mutation.
  *
  * Snapshot files are immutable and written tmp-then-rename under
  * fresh names (`snap-<seq>-<uuid>.gz`); readers take the highest seq,
  * so a half-written tmp is never eligible and the flip is the one
  * atomicity point. The last [[Keep]] snapshots are retained for
  * post-mortems; older ones are pruned at commit.
  *
  * Format: gzipped text, one `<len>\t<mtime>\t<rel>` line per file,
  * table-relative paths, terminated by an `end` marker (a truncated
  * upload parses as corrupt, not as a shorter table). Per-mutation
  * snapshot rewrites are O(live files) bytes — the simple-and-correct
  * end of the design space; Delta's action log + checkpoint compaction
  * is the known upgrade path if snapshot write cost ever shows up in a
  * soak (at 10^5 files a snapshot is ~1 MB gzipped).
  */
object Manifest {

  /** One live file: table-relative path, length, mtime (ms). */
  final case class Entry(rel: String, len: Long, mtime: Long)

  /** A parsed snapshot: its sequence number, the snapshot file's own
    * (name, len) — the memo-validity token — plus the live set and the
    * pending-removal list.
    */
  final case class State(seq: Long, snapName: String, snapLen: Long,
      entries: Seq[Entry], remove: Seq[String])

  private[operators] val Keep = 3

  def dir(tableDir: String): String = tableDir + "/_manifest"

  private val SnapRe = "snap-([0-9]{20})-[0-9a-f]{8}\\.gz".r

  /** (name, len) of the highest-seq snapshot, via ONE listing of the
    * `_manifest` directory; None when the directory is absent or holds
    * no snapshot (a table that never committed one — the legacy path).
    */
  def latestMeta(fs: FsOps, tableDir: String): Option[(String, Long)] = {
    val files = fs.listFiles(dir(tableDir))
    if (files.isEmpty) None
    else {
      val snaps = files.flatMap { case (p, len, _) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        name match {
          case SnapRe(_) => Some((name, len))
          case _ => None // .tmp- leftovers, foreign files: never eligible
        }
      }
      // name order IS seq order (zero-padded); uuid breaks ties, but a
      // driver-serialized writer never produces two files of one seq
      if (snaps.isEmpty) None else Some(snaps.maxBy(_._1))
    }
  }

  /** Sequence number from a snapshot NAME — parses independently of
    * the snapshot's bytes, which is what lets [[Catalog.refreshManifest]]
    * continue the sequence past a corrupt snapshot.
    */
  private[operators] def seqOfName(snapName: String): Long = seqOf(snapName)

  private def seqOf(snapName: String): Long = snapName match {
    case SnapRe(s) => s.toLong
    case _ => throw new IllegalStateException(
      s"manifest: not a snapshot name: '$snapName'")
  }

  /** Parse the latest snapshot. None = no snapshot exists (legacy
    * table); a PRESENT but unreadable snapshot throws — see the class
    * doc for why that must not fall back to the listing.
    */
  def load(fs: FsOps, tableDir: String): Option[State] =
    latestMeta(fs, tableDir).map { case (name, len) =>
      parse(name, len, fs.readBytes(s"${dir(tableDir)}/$name"), tableDir)
    }

  private[operators] def parse(name: String, len: Long, gz: Array[Byte],
      tableDir: String): State = {
    def corrupt(why: String): Nothing = throw new IllegalStateException(
      s"manifest: snapshot '$name' of '$tableDir' is unreadable ($why) — " +
        "a manifested table must not fall back to the tree listing " +
        "(uncommitted files would be adopted as data); inspect the tree " +
        "and run refreshManifest to re-establish it")
    val text =
      try {
        val in = new GZIPInputStream(new ByteArrayInputStream(gz))
        try new String(in.readAllBytes(), UTF_8) finally in.close()
      } catch { case e: java.io.IOException => corrupt(e.getMessage) }
    val lines = text.split('\n')
    if (lines.length < 4 || lines(0) != "graft-manifest 1") corrupt("header")
    if (lines.last != "end") corrupt("truncated: no end marker")
    val nFiles = lines(1).stripPrefix("files ").toLongOption
      .getOrElse(corrupt("files count")).toInt
    val entries = (2 until 2 + nFiles).map { i =>
      if (i >= lines.length) corrupt("short file section")
      val f = lines(i).split('\t')
      if (f.length != 3) corrupt(s"file line $i")
      Entry(f(2),
        f(0).toLongOption.getOrElse(corrupt(s"len line $i")),
        f(1).toLongOption.getOrElse(corrupt(s"mtime line $i")))
    }
    val ri = 2 + nFiles
    if (ri >= lines.length || !lines(ri).startsWith("remove "))
      corrupt("remove header")
    val nRemove = lines(ri).stripPrefix("remove ").toLongOption
      .getOrElse(corrupt("remove count")).toInt
    if (ri + 1 + nRemove + 1 != lines.length) corrupt("section lengths")
    val remove = (ri + 1 until ri + 1 + nRemove).map(lines(_))
    State(seqOf(name), name, len, entries, remove)
  }

  /** Write snapshot `prevSeq + 1` — THE commit point. Returns the new
    * state; prunes snapshots older than the last [[Keep]] and any
    * `.tmp-` leftovers from crashed commits.
    */
  def commit(fs: FsOps, tableDir: String, prevSeq: Long,
      entries: Seq[Entry], remove: Seq[String]): State = {
    (entries.map(_.rel) ++ remove).foreach { r =>
      require(!r.contains('\n') && !r.contains('\t') && r.nonEmpty,
        s"manifest: file path '$r' cannot be recorded (tab/newline)")
    }
    val sorted = entries.sortBy(_.rel)
    val sb = new StringBuilder
    sb.append("graft-manifest 1\n")
    sb.append(s"files ${sorted.length}\n")
    sorted.foreach(e => sb.append(e.len).append('\t').append(e.mtime)
      .append('\t').append(e.rel).append('\n'))
    sb.append(s"remove ${remove.length}\n")
    remove.foreach(r => sb.append(r).append('\n'))
    sb.append("end")
    val bout = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bout)
    gz.write(sb.toString.getBytes(UTF_8)); gz.close()
    val bytes = bout.toByteArray
    val seq = prevSeq + 1
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val name = f"snap-$seq%020d-$uuid.gz"
    val d = dir(tableDir)
    fs.mkdirs(d)
    val tmp = s"$d/.tmp-$uuid"
    fs.writeBytes(tmp, bytes)
    fs.move(tmp, s"$d/$name")
    // retention + tmp hygiene — never the snapshot just written
    fs.listFiles(d).foreach { case (p, _, _) =>
      val n = p.substring(p.lastIndexOf('/') + 1)
      n match {
        case SnapRe(_) if seqOf(n) <= seq - Keep => fs.rmTree(p)
        case _ if n.startsWith(".tmp-") && n != s".tmp-$uuid" => fs.rmTree(p)
        case _ => ()
      }
    }
    State(seq, name, bytes.length.toLong, sorted, remove)
  }
}
