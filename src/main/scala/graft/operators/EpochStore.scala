package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Write-beside + pointer-flip commits for the auxiliary parquet stores
  * (materialized-view partial logs, MVCC table data, durable index
  * artifacts) — the same crash posture [[Manifest]] gives Catalog
  * tables, at directory granularity:
  *
  *   1. build the new artifact into a FRESH epoch directory
  *      (`e<seq>-<uuid>/`) beside the live one — the live epoch keeps
  *      serving during the whole build;
  *   2. COMMIT: write a pointer file naming the new epoch into
  *      `_commits/` (tmp-then-rename under a fresh name; readers take
  *      the highest sequence, so a half-written tmp is never eligible
  *      and the rename is the one atomicity point);
  *   3. only then destroy superseded epoch directories. A crash before
  *      2 leaves the old pointer serving the old epoch exactly; a crash
  *      after 2 leaves the new epoch serving, with the stale directory
  *      as harmless garbage the NEXT commit's sweep removes.
  *
  * This retires the two legacy swap shapes the r15 verdict flagged:
  * `rm(dst); move(src, dst)` (a kill between the two leaves the store
  * EMPTY while its base keeps serving) and Spark's `mode("overwrite")`
  * directly onto the live directory (delete-then-write: a kill
  * mid-write leaves a PARTIAL artifact that a reader would adopt).
  *
  * Authority follows the manifest rule, scoped to what a pointer can
  * say: a store WITH a `_commits` pointer resolves to exactly the
  * committed epoch (uncommitted epoch dirs are invisible); a store
  * WITHOUT one is a legacy artifact and resolves to its root, listing
  * as before; a pointer that names a MISSING directory is corruption
  * and fails loud — never a fallback that could adopt a half-built
  * epoch.
  *
  * Readers that resolved an epoch stay pinned to it lazily (a
  * DataFrame holds paths, not content) — the same documented hazard as
  * the manifest's remove list: mutations are driver-serialized, and a
  * commit only sweeps epochs SUPERSEDED at its flip, so the window is
  * one epoch wide, identical to the table story.
  */
object EpochStore {

  private val PtrRe = "ptr-([0-9]{20})-[0-9a-f]{8}".r
  private val EpochRe = "e[0-9]{20}-[0-9a-f]{8}".r

  private def commitsDir(root: String) = root + "/_commits"

  private def nameOf(p: String) = p.substring(p.lastIndexOf('/') + 1)

  /** (pointer name, epoch dir name) of the highest-seq commit, via ONE
    * listing of the small `_commits` dir; None = no commit pointer
    * (legacy store, or nothing committed yet).
    */
  private def latest(fs: FsOps, root: String): Option[(String, String)] = {
    val ptrs = fs.listFiles(commitsDir(root)).flatMap { case (p, _, _) =>
      nameOf(p) match {
        case n @ PtrRe(_) => Some(n)
        case _ => None // .tmp- leftovers, foreign files: never eligible
      }
    }
    if (ptrs.isEmpty) None
    else {
      val n = ptrs.max // zero-padded seq: name order IS seq order
      val text = new String(
        fs.readBytes(s"${commitsDir(root)}/$n"), UTF_8)
      val lines = text.split('\n')
      if (lines.length != 3 || lines(0) != "graft-epoch 1" ||
          lines(2) != "end" || !EpochRe.pattern.matcher(lines(1)).matches())
        throw new IllegalStateException(
          s"epoch store: pointer '$n' of '$root' is unreadable — " +
            "inspect the store (resolving by listing could adopt a " +
            "half-built epoch)")
      Some((n, lines(1)))
    }
  }

  private def seqOf(ptrName: String): Long = ptrName match {
    case PtrRe(s) => s.toLong
    case _ => throw new IllegalStateException(
      s"epoch store: not a pointer name: '$ptrName'")
  }

  /** The directory readers serve: the committed epoch when a pointer
    * exists (a pointer naming a missing dir fails loud), else `root`
    * itself — the legacy layout, unchanged.
    */
  def resolve(fs: FsOps, root: String): String = latest(fs, root) match {
    case Some((n, epoch)) =>
      val dir = s"$root/$epoch"
      if (!fs.isDir(dir)) throw new IllegalStateException(
        s"epoch store: committed epoch '$epoch' of '$root' is missing " +
          s"(pointer '$n') — the store is corrupt; restore the directory " +
          "or remove the pointer to fall back to the root layout")
      dir
    case None => root
  }

  /** True when the store has a commit pointer (epoch layout). */
  def isEpochal(fs: FsOps, root: String): Boolean =
    latest(fs, root).isDefined

  /** Write-beside + flip: `write` builds the artifact into a fresh
    * epoch dir; the pointer rename is the commit point; superseded
    * epochs (and stale pointers/tmps beyond retention) are swept
    * strictly after. Returns the committed epoch dir.
    */
  def commit(fs: FsOps, root: String)(write: String => Unit): String = {
    val prev = latest(fs, root)
    val seq = prev.map(p => seqOf(p._1)).getOrElse(0L) + 1
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val epoch = f"e$seq%020d-$uuid"
    val dir = s"$root/$epoch"
    write(dir)
    // COMMIT: tmp-then-rename under a fresh name (readers take the
    // highest seq — a crash before this rename leaves the old epoch
    // serving; the unreferenced build dir is swept by the next commit)
    val cd = commitsDir(root)
    fs.mkdirs(cd)
    val bytes = s"graft-epoch 1\n$epoch\nend".getBytes(UTF_8)
    fs.writeBytes(s"$cd/.tmp-$uuid", bytes)
    fs.move(s"$cd/.tmp-$uuid", s"$cd/ptr-" + f"$seq%020d" + s"-$uuid")
    sweep(fs, root, epoch, seq)
    dir
  }

  /** Destruction, strictly after the flip: epoch dirs the new pointer
    * does not name (committed-and-superseded or crashed builds), stale
    * pointers beyond the last [[Keep]], and tmp leftovers. Never
    * touches legacy (non-`e<seq>-`) names, so a store migrated from
    * the root layout keeps its old files until the caller removes them.
    */
  private[operators] val Keep = 3

  private def sweep(fs: FsOps, root: String, liveEpoch: String,
      liveSeq: Long): Unit = {
    fs.listChildren(root).foreach { case (n, isDir) =>
      if (isDir && n != liveEpoch && EpochRe.pattern.matcher(n).matches())
        fs.rmTree(s"$root/$n")
    }
    fs.listFiles(commitsDir(root)).foreach { case (p, _, _) =>
      nameOf(p) match {
        case n @ PtrRe(_) if seqOf(n) <= liveSeq - Keep => fs.rmTree(p)
        case n if n.startsWith(".tmp-") => fs.rmTree(p)
        case _ => ()
      }
    }
  }
}
