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
}
