package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, SelfQueryFilter => F}

/** Exactness gate for max-score/WAND pruning in
  * [[graft.operators.Bm25Index.topKBatch]]: the pruned document-at-a-time
  * evaluation must return BIT-IDENTICAL arrays to the exhaustive
  * all-postings walk ([[graft.operators.Bm25Index.topKBatchExhaustive]])
  * on every input shape — random term sets (common terms included: those
  * are the lists pruning skips), every k regime (1, mid, ≥ corpus — the
  * last disables pruning entirely since the heap never fills), predicate
  * filters, tombstones, and multi-segment LSM chains from insert.
  *
  * Bm25IndexSpec separately gates the pruned path against an independent
  * full-scan scorer, and q124/q125/q127 against DuckDB — this spec is the
  * direct pruned-vs-exhaustive property the r7 verdict asked for.
  */
class Bm25WandSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sf)
  private lazy val index =
    Bm25Index.buildCached(docs, "wand#" + TestSpark.sf, "doc_id", "text")
  private lazy val vocab = docs
    .select(explode(Bm25Index.tokens(col("text"))).as("w"))
    .groupBy("w").count().orderBy(desc("count"))
    .as[(String, Long)].collect()

  private def assertParity(ix: Bm25Index, qs: Seq[Seq[String]], k: Int,
      filter: Option[F.Node] = None): Unit = {
    val pruned = ix.topKBatch(qs, k, filter)
    val full = ix.topKBatchExhaustive(qs, k, filter)
    assert(pruned.length == full.length)
    pruned.zip(full).zipWithIndex.foreach { case ((p, f), i) =>
      assert(p.toSeq == f.toSeq, // == on tuples: ids, dls AND raw doubles
        s"query $i (k=$k, terms=${qs(i)}) diverged:\n  pruned $p\n  full $f")
    }
  }

  test("random term sets: pruned ≡ exhaustive across k regimes (30 seeded draws)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    // weight the generator toward COMMON terms — the lists max-score
    // skips; unknowns and duplicates keep the dedup/absent contracts hot
    val common = vocab.take(20).map(_._1).toSeq
    val anyTerm = vocab.map(_._1).toSeq
    val termGen = Gen.frequency(
      3 -> Gen.oneOf(common),
      2 -> Gen.oneOf(anyTerm),
      1 -> Gen.oneOf(Seq("zzznope", "QUERY", "Data")))
    for (seed <- 1L to 30L) {
      val nTerms = sample(Gen.chooseNum(1, 6), seed)
      val terms = sample(Gen.listOfN(nTerms, termGen), seed + 100)
      val k = sample(Gen.oneOf(1, 3, 10, 50, Int.MaxValue), seed + 200)
      assertParity(index, Seq(terms), k)
    }
  }

  test("batched: many queries share one job, each bit-equal to exhaustive") {
    val qs = Seq(
      vocab.take(3).map(_._1).toSeq,          // all-common: max pruning
      Seq(vocab.head._1),                     // single most-common term
      vocab.takeRight(3).map(_._1).toSeq,     // all-rare: no pruning needed
      Seq("query", "scan", "data", "the"),
      Seq("zzznotaterm"),
      Seq.empty[String])
    for (k <- Seq(1, 10, 1000)) assertParity(index, qs, k)
  }

  test("filtered: predicate admission prunes identically") {
    val ixm = Bm25Index.buildCached(docs, "wand-meta#" + TestSpark.sf,
      "doc_id", "text", metaCols = Seq("lang", "n_chars"))
    val qs = Seq(Seq("query", "data", "the"), vocab.take(4).map(_._1).toSeq)
    for (node <- Seq[F.Node](
      F.Eq("lang", F.S("en")),
      F.And.of(F.Ne("lang", F.S("zh")), F.Gt("n_chars", F.I(250))),
      F.Eq("lang", F.S("nosuchlang")))) // empty survivor set
      for (k <- Seq(1, 10)) assertParity(ixm, qs, k, Some(node))
  }

  test("tombstones + LSM segments: pruned ≡ exhaustive on mutated chains") {
    val ix = Bm25Index.build(docs.filter(col("doc_id") < 350),
      "doc_id", "text", shards = 3)
    val ix2 = ix.insert(
      docs.filter(col("doc_id") >= 350 && col("doc_id") < 500),
      "doc_id", "text")
    try {
      assert(ix2.segmentCounts.exists(_ >= 2)) // really multi-segment
      val qs = Seq(Seq("query", "data"), vocab.take(3).map(_._1).toSeq)
      assertParity(ix2, qs, 15)
      // tombstone the current top hit, re-check parity
      ix2.delete(ix2.topK(Seq("query"), 3).map(_._1))
      assertParity(ix2, qs, 15)
    } finally { ix2.unpersist(); ix.unpersist() }
  }

  test("heap-threshold ties: equal rounded scores break by doc id, both paths") {
    // identical texts ⇒ identical scores ⇒ the k cutoff lands INSIDE a
    // rounded-score tie group; pruning must keep the smallest doc ids
    val tied = (1L to 60L).map(i => (i, "alpha beta gamma")) ++
      (100L to 120L).map(i => (i, "alpha delta"))
    val ix = Bm25Index.build(tied.toDF("doc_id", "text"), "doc_id", "text", 2)
    try {
      for (k <- Seq(5, 30, 59, 61, 200))
        assertParity(ix, Seq(Seq("alpha", "beta"), Seq("alpha")), k)
      val got = ix.topK(Seq("alpha", "beta"), 5).map(_._1).toSeq
      assert(got == got.sorted, s"tie group not id-ordered: $got")
    } finally ix.unpersist()
  }
}
