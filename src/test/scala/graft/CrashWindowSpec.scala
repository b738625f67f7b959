package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Catalog, FsOps}

/** The r16 verdict's done-criterion for manifest-transactional sidecar
  * folds, executable: for every mutation that previously
  * destroyed-then-recommitted (whose mid-window kill left reads failing
  * loud until refreshManifest), kill the "process" at EVERY mutating
  * filesystem operation and assert a fresh process reads either the old
  * or the new committed state — SERVING, never refusing — and that the
  * documented recovery (the next mutator entry) lands exactly the new
  * state. The sweep machinery is [[ChaosSoak.sweepKillPoints]] (the
  * soak main runs the full store battery; this gate-suite subset covers
  * the Catalog windows the r17 restructure closed).
  */
class CrashWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val real = FsOps(spark)
  private def root = "/root/repo/target/tmp/crashwin"

  /** One seeded table per suite run: 3 partitions, a live deletion
    * mask (day=0 fully masked — the zero-survivor branch), two patch
    * batches.
    */
  private lazy val seed: String = {
    val s = s"$root/seed"
    real.rmTree(s)
    val cat = Catalog(spark, s)
    val df = spark.range(120).select(col("id"),
      (col("id") % 3).cast("string").as("day"), (col("id") % 97).as("n"))
    cat.create("t", df.repartition(1), Seq("day"))
    cat.deleteWhereLight("t", col("n") > 90)
    cat.deleteWhereLight("t", col("day") === "0")
    cat.updateWhereLight("t", col("n") === 5, Map("n" -> lit(-5L)))
    s
  }

  private def obs(w: String): Seq[String] =
    Catalog(spark, w).readRaw("t").select("id", "day", "n")
      .collect().map(_.toString).sorted.toSeq

  private def sweep(label: String)(f: Catalog => Unit): Unit = {
    val n = ChaosSoak.sweepKillPoints(spark, label, seed,
      w => f(Catalog(spark, w)), obs)
    assert(n > 0, s"$label: the sweep found no kill points — the " +
      "mutation performed no in-scope FS ops (harness regression)")
  }

  // the gate-suite subset: the two representative new flip shapes (a
  // pruned heavy mutation with a live sidecar fold, and the partition
  // drop). ChaosSoak's main runs the FULL battery exhaustively —
  // updateWhere, compactMask/compactPatches, applyDeletedMask incl.
  // the zero-survivor branch, killMutations, optimize, detach/attach/
  // move, MVCC, matview, raw EpochStore — with counts in PLANS.md.

  test("pruned DELETE WHERE: every kill point serves, recovery lands the delete") {
    sweep("deleteWhere")(_.deleteWhere("t", col("n") < 10))
  }

  test("DROP PARTITION: every kill point serves; sidecar fold flips with it") {
    sweep("dropPartition")(_.dropPartition("t", "day", "1"))
  }
}
