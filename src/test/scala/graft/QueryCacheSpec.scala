package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QueryCache

/** Gates for the CH-style query result cache: hit-without-recompute,
  * result fidelity, per-entry cap, TTL staleness, LRU under budget.
  */
class QueryCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("second execution is served from cache, bit-identical") {
    val qc = new QueryCache(spark)
    var builds = 0
    def run() = qc.cachedBy("k1") {
      builds += 1
      spark.range(0, 100).selectExpr("id % 7 AS g")
        .groupBy("g").count().orderBy("g")
    }
    val a = run().collect().map(_.toSeq).toSeq
    val b = run().collect().map(_.toSeq).toSeq
    assert(builds == 1 && a == b)
    assert(qc.hits.get() == 1 && qc.misses.get() == 1)
    val c = qc.sql("SELECT 1 AS one").collect()
    val d = qc.sql("SELECT 1 AS one").collect()
    assert(c.toSeq == d.toSeq && qc.hits.get() == 2)
  }

  test("over-cap results are returned but not cached") {
    val qc = new QueryCache(spark, maxEntryBytes = 1024)
    val out = qc.cachedBy("big") {
      spark.range(0, 10000).selectExpr("concat('xxxxxxxxxx', id) AS s")
    }.count()
    assert(out == 10000 && qc.size == 0)
  }

  test("TTL: stale entries recompute") {
    var now = 1000L
    val qc = new QueryCache(spark, ttlMillis = 50, nowMs = () => now)
    var builds = 0
    def run() = qc.cachedBy("t") { builds += 1; spark.range(0, 3).toDF("id") }
    run().collect(); run().collect()
    assert(builds == 1)
    now += 100 // past TTL
    run().collect()
    assert(builds == 2)
  }

  test("LRU eviction under total budget keeps the hottest entries") {
    val qc = new QueryCache(spark, maxTotalBytes = 4000, maxEntryBytes = 4000)
    (1 to 5).foreach { i =>
      qc.cachedBy(s"e$i")(spark.range(0, 50).toDF("id")).collect()
    }
    assert(qc.usedBytes <= 4000)
    assert(qc.size < 5) // something was evicted
    // most recent key survives
    var rebuilt = false
    qc.cachedBy("e5") { rebuilt = true; spark.range(0, 50).toDF("id") }.collect()
    assert(!rebuilt)
  }
}
