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
  *   2. COMMIT: create the pointer file `ptr-<seq>` in `_commits/` via
  *      create-if-absent — the CAS (see the concurrency contract
  *      below); readers take the highest committed sequence;
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
  * CONCURRENCY CONTRACT (optimistic, Delta's commit shape — a public
  * design). Mutations within one process stay driver-serialized, but
  * the reference's deployment runs ingest and compaction as SEPARATE
  * jobs over one store; two processes must not silently lose an
  * update. The commit point is [[FsOps.createIfAbsent]] on the
  * deterministic name `ptr-<seq>` — CONTENT-ATOMIC (staged bytes,
  * linked/renamed into place), so a pointer either exists complete or
  * not at all. Two writers that both derived their build from
  * sequence N both target N+1, exactly one claims the pointer, and
  * the loser throws [[ConcurrentCommitException]] — it re-reads and
  * retries, or surfaces the refusal. No interleaving yields a silent
  * lost update: a commit either names its own epoch at a sequence
  * nothing else claimed, or it fails loudly. (The winner's post-flip
  * sweep may delete a same-sequence loser's half-built epoch dir
  * mid-build; that loser's write or CAS then errors — the same loud
  * refusal, just earlier.) Crash artifacts are an unclaimed epoch
  * build dir (swept when the live sequence reaches it) and a staged
  * `.tmp-` file (hygiene) — never a partial pointer. Pre-CAS pointers
  * (`ptr-<seq>-<uuid>`, tmp-then-renamed, so complete by construction)
  * are still honored for artifacts written by earlier builds.
  *
  * Authority follows the manifest rule, scoped to what a pointer can
  * say: a store WITH a committed pointer resolves to exactly the
  * committed epoch (uncommitted epoch dirs are invisible); a store
  * WITHOUT one is a legacy artifact and resolves to its root, listing
  * as before; a pointer that names a MISSING directory — or whose
  * bytes do not parse (content-atomic claims cannot be truncated by a
  * crash, so unparseable means corrupt) — fails loud. Never a
  * fallback that could adopt a half-built epoch.
  *
  * Readers that resolved an epoch stay pinned to it lazily (a
  * DataFrame holds paths, not content) — the same documented hazard as
  * the manifest's remove list: a commit only sweeps epochs SUPERSEDED
  * at its flip, so the window is one epoch wide, identical to the
  * table story.
  */
object EpochStore {

  private val PtrCasRe = "ptr-([0-9]{20})".r
  private val PtrLegacyRe = "ptr-([0-9]{20})-[0-9a-f]{8}".r
  private val EpochRe = "e[0-9]{20}-[0-9a-f]{8}".r

  private def commitsDir(root: String) = root + "/_commits"

  private def nameOf(p: String) = p.substring(p.lastIndexOf('/') + 1)

  private def seqOf(ptrName: String): Long = {
    val digits = ptrName match {
      case PtrCasRe(s) => s
      case PtrLegacyRe(s) => s
      case _ => throw new IllegalStateException(
        s"epoch store: not a pointer name: '$ptrName'")
    }
    digits.toLongOption.getOrElse(throw new IllegalStateException(
      s"epoch store: pointer '$ptrName' claims a sequence past Long " +
        "range — the store is corrupt (protocol sequences start at 1)"))
  }

  /** All pointer names in the `_commits` dir (both formats), plus the
    * max sequence any of them claims (0 when none) — ONE listing.
    */
  private def pointers(fs: FsOps, root: String): Seq[String] =
    fs.listFiles(commitsDir(root)).flatMap { case (p, _, _) =>
      nameOf(p) match {
        case n @ PtrCasRe(_) => Some(n)
        case n @ PtrLegacyRe(_) => Some(n)
        case _ => None // .tmp- leftovers, foreign files: never eligible
      }
    }

  /** (pointer name, epoch dir name) of the highest-seq pointer; None =
    * no pointer (legacy store, or nothing committed yet). Pointers are
    * content-atomic claims, so an unreadable one is CORRUPTION and
    * fails loud — resolving around it could adopt the wrong epoch.
    */
  private def latest(fs: FsOps, root: String): Option[(String, String)] = {
    val ptrs = pointers(fs, root)
    if (ptrs.isEmpty) None
    else {
      // max by NAME: both formats zero-pad the sequence to 20 digits,
      // so name order IS seq order (no seq parse — resolution must
      // reach the loud unreadable-bytes path even for a pointer whose
      // claimed digits overflow a Long). At one seq a CAS pointer and
      // a legacy pointer cannot both be live protocol outputs, but the
      // order resolves deterministically anyway (the -uuid form sorts
      // after the bare form — a fixed order both sides of any race
      // agree on is what matters).
      val n = ptrs.max
      val text = new String(fs.readBytes(s"${commitsDir(root)}/$n"), UTF_8)
      val lines = text.split('\n')
      val valid = lines.length == 3 && lines(0) == "graft-epoch 1" &&
        lines(2) == "end" && EpochRe.pattern.matcher(lines(1)).matches()
      if (valid) Some((n, lines(1)))
      else throw new IllegalStateException(
        s"epoch store: pointer '$n' of '$root' is unreadable — " +
          "inspect the store (resolving by listing could adopt a " +
          "half-built epoch)")
    }
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

  /** True when the store has a committed pointer (epoch layout). */
  def isEpochal(fs: FsOps, root: String): Boolean =
    latest(fs, root).isDefined

  /** Write-beside + flip: `write` builds the artifact into a fresh
    * epoch dir; the create-if-absent of `ptr-<seq>` is the commit
    * point (throws [[ConcurrentCommitException]] when another writer
    * claimed the sequence first — see the class doc's concurrency
    * contract); superseded epochs (and stale pointers/tmps beyond
    * retention) are swept strictly after. Returns the committed epoch
    * dir.
    */
  def commit(fs: FsOps, root: String)(write: String => Unit): String = {
    // target one past the committed sequence (pointers are all
    // committed claims — content-atomic); a racer's claim is always
    // detected by the CAS because racers target the SAME sequence
    val seq = pointers(fs, root).map(seqOf).maxOption.getOrElse(0L) + 1
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val epoch = f"e$seq%020d-$uuid"
    val dir = s"$root/$epoch"
    write(dir)
    val cd = commitsDir(root)
    fs.mkdirs(cd)
    val bytes = s"graft-epoch 1\n$epoch\nend".getBytes(UTF_8)
    // THE COMMIT — the content-atomic CAS (a crash leaves at most a
    // staged .tmp- file, never a partial pointer)
    if (!fs.createIfAbsent(s"$cd/ptr-" + f"$seq%020d", bytes)) {
      fs.rmTree(dir) // our build: unreferenced, safe to drop
      throw new ConcurrentCommitException(
        s"epoch store: sequence $seq of '$root' was claimed by a " +
          "concurrent writer — re-read the store and retry the commit")
    }
    sweep(fs, root, epoch, seq)
    dir
  }

  /** Destruction, strictly after the flip: epoch dirs AT OR BELOW the
    * live sequence that the new pointer does not name (committed-and-
    * superseded epochs, crashed builds — a real crashed build's
    * sequence is exactly the next target, so the very next commit
    * reaches it), stale pointers beyond the last [[Keep]], and tmp
    * leftovers. Dirs ABOVE the live sequence are spared: they are a
    * concurrent writer's in-flight build — deleting one whose CAS then
    * SUCCEEDS would commit a pointer to a missing directory, turning a
    * refusal into corruption. (A same-sequence in-flight build is
    * swept: its sequence is already claimed, its CAS can only fail.)
    * Never touches legacy (non-`e<seq>-`) names, so a store migrated
    * from the root layout keeps its old files until the caller removes
    * them.
    */
  private[operators] val Keep = 3

  private val EpochSeqRe = "e([0-9]{20})-[0-9a-f]{8}".r

  private def sweep(fs: FsOps, root: String, liveEpoch: String,
      liveSeq: Long): Unit = {
    fs.listChildren(root).foreach { case (n, isDir) =>
      if (isDir && n != liveEpoch) n match {
        case EpochSeqRe(s) if s.toLong <= liveSeq => fs.rmTree(s"$root/$n")
        case _ => ()
      }
    }
    // tmps younger than a minute are a concurrent commit's staging
    // window (milliseconds-long) — sweeping one fails a legitimate
    // claim spuriously; a crashed claim's tmp ages past the floor
    // before the next sweep in any real sequence ([[Manifest]]'s
    // retention applies the same floor)
    val nowMs = System.currentTimeMillis()
    fs.listFiles(commitsDir(root)).foreach { case (p, _, mt) =>
      nameOf(p) match {
        case n @ (PtrCasRe(_) | PtrLegacyRe(_)) if seqOf(n) <= liveSeq - Keep =>
          fs.rmTree(p)
        case n if n.startsWith(".tmp-") && nowMs - mt >= 60000L =>
          fs.rmTree(p)
        case _ => ()
      }
    }
  }
}
