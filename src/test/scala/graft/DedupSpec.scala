package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Cluster resolution for dedup manifests (q109's engine). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    Dedup.connectedComponents(
      pairs.toDF("i", "j"), nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("multi-hop chains collapse to the component minimum") {
    // 1-2-3-4-5 chain (diameter 4, forces >1 propagation round) plus a
    // separate pair and an isolated node
    val got = cc(Seq(2L -> 3L, 1L -> 2L, 4L -> 5L, 3L -> 4L, 7L -> 8L),
      (1L to 9L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("edge orientation and duplication do not change the result") {
    val a = cc(Seq(1L -> 2L, 2L -> 3L), Seq(1L, 2L, 3L))
    val b = cc(Seq(3L -> 2L, 2L -> 1L, 1L -> 2L), Seq(1L, 2L, 3L))
    assert(a == b && a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graphs converge in one round regardless of center id") {
    val got = cc(Seq(10L -> 1L, 10L -> 2L, 10L -> 3L), Seq(1L, 2L, 3L, 10L))
    assert(got.values.toSet == Set(1L))
  }

  test("edge endpoints missing from the node universe still stabilize") {
    // 5 and 6 appear only as edge endpoints (not in nodes): they have no
    // self row, so their prev-label is NULL in round 1 — the coalesce in
    // connectedComponents must count them as changed until their label is
    // the true component minimum, not let the loop converge prematurely.
    // Chain 1-5-6-2 forces multi-round propagation THROUGH the unseen
    // nodes for 2 to reach canonical 1.
    val got = cc(Seq(1L -> 5L, 5L -> 6L, 6L -> 2L), Seq(1L, 2L))
    assert(got(1L) == 1L && got(2L) == 1L)
    assert(got.get(5L).forall(_ == 1L) && got.get(6L).forall(_ == 1L))
  }

  test("exactSubstr: cross-doc and within-doc repeats, coverage union, short docs") {
    import spark.implicits._
    val shared = "alpha beta gamma delta" // 4 tokens, L = 4 below
    val docs = Seq(
      (1L, s"unique one here then $shared and tail x"),     // shares with 2
      (2L, s"$shared entirely different remainder words"),  // shares with 1
      (3L, s"self repeat: $shared stop $shared end"),       // within-doc too
      (4L, "completely unique text with no duplicate runs at all"),
      (5L, "tiny doc")                                       // < L tokens
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .exactSubstrDuplication(docs, "doc_id", "text", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_tokens"), r.getAs[Int]("n_tokens"))).toMap
    // doc 4 (unique) and doc 5 (too short) report nothing
    assert(!got.contains(4L) && !got.contains(5L))
    // docs 1/2: exactly the 4 shared tokens are covered (one seed window)
    assert(got(1L) == ((4L, 11)))
    assert(got(2L) == ((4L, 8)))
    // doc 3: the phrase occurs twice WITHIN the doc (paper semantics:
    // any second occurrence in the corpus counts) -> both spans covered
    assert(got(3L) == ((8L, 12)))
    // overlapping seed windows union, never double-count: two docs
    // sharing a 5-token run have two overlapping 4-windows -> 5 tokens
    val over = Seq(
      (10L, "p q r s t junk1 junk2 junk3"),
      (11L, "zz p q r s t other words here")).toDF("doc_id", "text")
    val g2 = graft.operators.Dedup
      .exactSubstrDuplication(over, "doc_id", "text", 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(g2(10L) == 5L && g2(11L) == 5L)
  }

  test("exactSubstrClean cuts exactly the covered spans") {
    import spark.implicits._
    val docs = Seq(
      (1L, "head words alpha beta gamma delta tail piece"),
      (2L, "alpha beta gamma delta"),            // fully covered -> ''
      (3L, "nothing shared in this one at all"), // untouched
      (4L, "tiny")                                // < L
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .exactSubstrClean(docs, "doc_id", "text", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("dup_tokens"))).toMap
    assert(got(1L) == (("head words tail piece", 4L)))
    assert(got(2L) == (("", 4L))) // everything duplicated, empty survivor
    assert(got(3L) == (("nothing shared in this one at all", 0L)))
    assert(got(4L) == (("tiny", 0L)))
  }
}
