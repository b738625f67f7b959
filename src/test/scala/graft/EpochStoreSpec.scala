package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, EpochStore, FsOps, MatView, MvccCatalog,
  PqIndex}
import org.apache.spark.sql.graft.ProjectionCatalog.Measure

/** Write-beside + pointer-flip commits for the side stores (r15 verdict
  * item 1): materialized-view partial logs, MVCC data, durable index
  * artifacts. The contract pinned here, per store:
  *
  *   - crash window A (epoch directory written, pointer NOT flipped):
  *     the OLD state serves exactly — simulated by planting a rogue
  *     epoch dir with different contents and no pointer;
  *   - crash window B (flipped, superseded dir not yet swept): the NEW
  *     state serves; the next commit's sweep removes the leftover;
  *   - a corrupt pointer, or a pointer naming a missing epoch, fails
  *     LOUD — resolving by listing could adopt a half-built epoch;
  *   - legacy artifacts (pre-epoch layout, files at the root) keep
  *     reading, and the first commit migrates them under the flip.
  */
class EpochStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fs = FsOps(spark)
  private def tmp(tag: String) = Files.createTempDirectory(tag).toString

  private def plantRogue(root: String, seq: Long): String = {
    // a build that crashed before its flip: real parquet, no pointer.
    // A real crashed build sits at exactly the NEXT target sequence
    // (commit targets one past the max claimed pointer), so callers
    // pass live+1 — the next commit both supersedes and sweeps it;
    // higher sequences are spared by design (they could be a
    // concurrent writer's in-flight build — see EpochStore.sweep)
    val rogue = f"$root/e$seq%020d-deadbeef"
    Seq((42L, 42L)).toDF("a", "b").write.parquet(rogue)
    rogue
  }

  test("resolve: legacy root, committed epoch, corrupt pointer loud") {
    val root = tmp("eps1")
    assert(EpochStore.resolve(fs, root) == root) // legacy: no pointer
    val d1 = EpochStore.commit(fs, root)(dir =>
      Seq(1, 2, 3).toDF("x").write.parquet(dir))
    assert(EpochStore.resolve(fs, root) == d1)
    assert(spark.read.parquet(EpochStore.resolve(fs, root)).count() == 3)
    // rogue epoch without a pointer: invisible (crash window A)
    plantRogue(root, seq = 2)
    assert(EpochStore.resolve(fs, root) == d1)
    // second commit supersedes and SWEEPS both the old epoch and the
    // rogue build (crash window B cleanup)
    val d2 = EpochStore.commit(fs, root)(dir =>
      Seq(1, 2, 3, 4).toDF("x").write.parquet(dir))
    assert(EpochStore.resolve(fs, root) == d2)
    val dirs = fs.listChildren(root).filter(_._2).map(_._1)
    assert(dirs.count(_.startsWith("e0")) == 1 && !fs.isDir(d1))
    // pointer naming a missing dir: loud
    fs.rmTree(d2)
    val e1 = intercept[IllegalStateException] { EpochStore.resolve(fs, root) }
    assert(e1.getMessage.contains("corrupt"))
    // present-but-garbage pointer bytes: loud, never a listing fallback
    val root2 = tmp("eps1b")
    EpochStore.commit(fs, root2)(dir => Seq(1).toDF("x").write.parquet(dir))
    fs.writeBytes(s"$root2/_commits/ptr-99999999999999999999-aaaaaaaa",
      "garbage".getBytes("UTF-8"))
    val e2 = intercept[IllegalStateException] { EpochStore.resolve(fs, root2) }
    assert(e2.getMessage.contains("unreadable"))
  }

  test("matview: compact crash windows; legacy artifact migrates") {
    val df = spark.range(300).select((col("id") % 7).as("k"),
      col("id").as("v"))
    val measures = Seq(Measure("v", None))
    // LEGACY artifact: partial log written at the root, pre-epoch
    val root = tmp("eps2")
    org.apache.spark.sql.graft.ProjectionCatalog
      .partialAgg(df, Seq("k"), measures)
      .write.mode("overwrite").parquet(root)
    val mv = MatView(spark, root, Seq("k"), measures)
    val expect = mv.read().orderBy("k").collect().toSeq
    // crash window A on the legacy store: a rogue epoch dir without a
    // pointer must stay invisible
    plantRogue(root, seq = 1)
    assert(mv.read().orderBy("k").collect().toSeq == expect)
    // compact = first flip: migrates under the pointer, same answers,
    // root-level legacy files dropped, rogue dir swept
    mv.compact()
    assert(mv.read().orderBy("k").collect().toSeq == expect)
    assert(mv.partialCount() == 7)
    assert(!fs.listChildren(root).exists { case (n, d) => !d && n != "_commits" })
    assert(fs.listChildren(root).count { case (n, d) => d && n.startsWith("e0") } == 1)
    // inserts append into the committed epoch; another compact flips again
    mv.insert(df.withColumn("v", col("v") + 1))
    val expect2 = mv.read().orderBy("k").collect().toSeq
    mv.compact()
    assert(mv.read().orderBy("k").collect().toSeq == expect2)
  }

  test("mvcc: compact crash windows; tombstones stay correct after flip") {
    val mc = MvccCatalog(spark, tmp("eps3"))
    val rows = spark.range(100).select(col("id").as("k"),
      (col("id") % 10).as("v"))
    mc.create("t", rows, version = 1)
    mc.append("t", rows.filter(col("k") < 10).withColumn("v", lit(99L)),
      version = 2)
    mc.deleteWhere("t", col("v") === 5, Seq("k"), version = 3)
    val expect = mc.read("t", Seq("k")).orderBy("k").collect().toSeq
    // k in 0..9 were rewritten to v=99 at version 2, so LWW shields
    // them from the v=5 delete; only k=15,25,..,95 go (9 rows)
    assert(expect.length == 91)
    // crash window A: compacted epoch written, pointer not flipped —
    // old data + tombstones serve the same net state
    val dataRoot = s"${mc.root}/t/data"
    plantRogue(dataRoot, seq = 2)
    assert(mc.read("t", Seq("k")).orderBy("k").collect().toSeq == expect)
    // the real compact: flip, tombstones folded + dropped, same state
    mc.compact("t", Seq("k"), version = 4)
    assert(mc.read("t", Seq("k")).orderBy("k").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))) ==
      expect.map(r => (r.getLong(0), r.getLong(1))))
    assert(!fs.exists(s"${mc.root}/t/tombstones"))
    // stale tombstones between flip and delete would filter NOTHING:
    // compacted __v is newer than every __tv (pinned by re-applying one)
    mc.deleteWhere("t", col("k") === 0, Seq("k"), version = 5)
    assert(mc.read("t", Seq("k")).count() == 90)
    // append after migration lands in the committed epoch; the new
    // version outlives the k=0 tombstone, so the key resurfaces
    mc.append("t", rows.filter(col("k") === 0), version = 6)
    assert(mc.read("t", Seq("k")).count() == 91)
  }

  test("durable index saves: re-save is crash-safe, loads serve the commit") {
    import graft.operators.{AnnIndex, IvfGraph}
    val vecs = spark.range(200).select(col("id"),
      array((0 until 8).map(i => (rand(i + 1) * 2 - 1).cast("float")): _*)
        .as("emb")).cache()
    val (model0, indexed) = AnnIndex.fit(vecs, "emb", "id", k = 4, iters = 3)
    val path = tmp("eps4") + "/gidx"
    IvfGraph.save(spark, IvfGraph.build(indexed, model0, "id", "emb"), path)
    val q = Array.fill(8)(0.3f)
    def serve() = IvfGraph.load(spark, path)
      .topK(q, 5, nprobe = 4, ef = 64)._1.toSeq
    val r1 = serve()
    // crash window A of a RE-SAVE: rogue epoch, no pointer — the first
    // save keeps serving (the old overwrite-in-place would have
    // destroyed it before the new one finished)
    plantRogue(path, seq = 2)
    assert(serve() == r1)
    // a completed re-save flips and serves; rogue + old epoch swept
    val half = vecs.filter(col("id") < 100)
    val (mh, ih) = AnnIndex.fit(half, "emb", "id", k = 4, iters = 3)
    IvfGraph.save(spark, IvfGraph.build(ih, mh, "id", "emb"), path)
    val r2 = serve()
    assert(r2.forall(_._1 < 100L))
    assert(fs.listChildren(path).count { case (n, d) => d && n.startsWith("e0") } == 1)

    // BM25: same machinery — flip serves the commit, rogue invisible
    val docs = spark.range(80).select(col("id"),
      concat(lit("alpha beta doc "), col("id") % 9).as("body"))
    val bpath = tmp("eps4b") + "/bm25"
    Bm25Index.save(spark, Bm25Index.build(docs, "id", "body"), bpath)
    val b1 = Bm25Index.load(spark, bpath).topK(Seq("alpha", "3"), 4).toSeq
    plantRogue(bpath, seq = 2)
    assert(Bm25Index.load(spark, bpath).topK(Seq("alpha", "3"), 4).toSeq == b1)

    // PQ: codebooks + codes flip together
    val emb = spark.range(64).select(col("id").as("vec_id"),
      array((0 until 8).map(i => (rand(i + 7) * 2 - 1).cast("float")): _*)
        .as("embedding"))
    val pqModel = PqIndex.fitCached(emb, "epochspec", "embedding", "vec_id",
      m = 4, k = 16, iters = 3)
    val enc = emb.withColumn("__code",
      PqIndex.encode(pqModel, col("embedding")))
    val ppath = tmp("eps4c") + "/pq"
    PqIndex.save(pqModel, enc, ppath)
    val (lm, lenc) = PqIndex.load(spark, ppath)
    assert(lm.codebooks.length == 4 && lenc.count() == 64)
    plantRogue(ppath, seq = 2)
    val (lm2, lenc2) = PqIndex.load(spark, ppath)
    assert(lm2.codebooks.length == 4 && lenc2.count() == 64)
    vecs.unpersist()
  }
}
