package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashEmbedder
import graft.operators.{PackedScan, ServingCache}

/** Gates for the serving-memory governor ([[graft.operators.ServingCache]]).
  *
  * The cache is correctness-neutral by design (evict = unpersist + rebuild
  * on next use), so what needs pinning is the POLICY: the byte budget is
  * enforced, eviction is least-recently-USED first, concurrent same-key
  * builds collapse to one, an evicted-then-rebuilt structure answers
  * bit-identically, and byte accounting trusts only materialized
  * accumulators (an inflated plan estimate would evict everything else).
  *
  * The spec saves and restores the global budget — suites share one forked
  * JVM and other suites register real structures here.
  */
class ServingCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Run `body` under a temporary byte budget, restoring the previous
    * budget (and whatever fits of the policy state) afterwards.
    */
  private def withBudget[A](bytes: Long)(body: => A): A = {
    val prev = ServingCache.maxBytes
    ServingCache.setMaxBytes(bytes)
    try body finally ServingCache.setMaxBytes(prev)
  }

  private def admit(key: String, bytes: Long,
      evicted: scala.collection.mutable.Set[String]): Unit = {
    ServingCache.getOrBuild(key) {
      (new Object, bytes, () => { evicted += key; () })
    }
    ()
  }

  test("budget is enforced: totalBytes <= maxBytes after every admission") {
    val evicted = scala.collection.mutable.Set.empty[String]
    withBudget(100L) {
      admit("sc-a", 40, evicted)
      assert(ServingCache.totalBytes <= 100)
      admit("sc-b", 40, evicted)
      assert(ServingCache.totalBytes <= 100)
      admit("sc-c", 40, evicted)
      assert(ServingCache.totalBytes <= 100,
        s"over budget: ${ServingCache.totalBytes}")
      assert(evicted.nonEmpty, "third 40-byte admission must evict")
    }
  }

  test("an entry larger than the whole budget is kept (it must serve its query)") {
    val evicted = scala.collection.mutable.Set.empty[String]
    withBudget(100L) {
      admit("sc-huge", 500, evicted)
      assert(ServingCache.contains("sc-huge"))
      assert(!evicted.contains("sc-huge"))
      // but it is first out when anything else arrives
      admit("sc-small", 10, evicted)
      assert(evicted.contains("sc-huge"))
      assert(ServingCache.contains("sc-small"))
    }
  }

  test("eviction is least-recently-USED first (a getOrBuild hit refreshes)") {
    val evicted = scala.collection.mutable.Set.empty[String]
    withBudget(100L) {
      admit("sc-lru-a", 40, evicted)
      admit("sc-lru-b", 40, evicted)
      // touch A: a cache-hit getOrBuild must refresh its LRU position
      admit("sc-lru-a", 40, evicted)
      admit("sc-lru-c", 40, evicted) // 120 > 100: evict exactly the LRU one
      assert(evicted == Set("sc-lru-b"),
        s"expected only sc-lru-b evicted, got $evicted")
      assert(ServingCache.contains("sc-lru-a"))
      assert(ServingCache.contains("sc-lru-c"))
    }
  }

  test("concurrent same-key getOrBuild builds exactly once") {
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[AnyRef] {
          def call(): AnyRef = {
            start.await()
            ServingCache.getOrBuild("sc-race") {
              Thread.sleep(50) // widen the race window
              builds.incrementAndGet()
              (new Object, 1L, () => ())
            }
          }
        })
      }
      start.countDown()
      val values = futures.map(_.get(30, TimeUnit.SECONDS))
      assert(builds.get() == 1, s"built ${builds.get()} times")
      assert(values.distinct.size == 1, "all callers must see the one built value")
    } finally {
      pool.shutdownNow()
      ServingCache.evict("sc-race")
    }
  }

  test("nested getOrBuild inside a build closure fails fast (deadlock guard)") {
    val ex = intercept[IllegalStateException] {
      ServingCache.getOrBuild("sc-outer") {
        ServingCache.getOrBuild("sc-inner") { (new Object, 1L, () => ()) }
        (new Object, 1L, () => ())
      }
    }
    assert(ex.getMessage.contains("sc-outer"))
    assert(!ServingCache.contains("sc-outer"))
    assert(!ServingCache.contains("sc-inner"))
    // the failed build must release its lock: a retry without nesting works
    ServingCache.getOrBuild("sc-outer") { (new Object, 1L, () => ()) }
    assert(ServingCache.contains("sc-outer"))
    ServingCache.evict("sc-outer")
  }

  test("evicted-then-rebuilt PackedScan returns bit-identical top-k") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = HashEmbedder.embed("eviction parity probe")
    val first = PackedScan
      .buildCached(e, "evict-spec#" + TestSpark.sf, "vec_id", "embedding")
      .topK(q, 10)
    // shrink the budget to zero head-room: enforce() evicts EVERYTHING
    // (no admission in flight, so nothing is kept)
    val prev = ServingCache.maxBytes
    try {
      ServingCache.setMaxBytes(1L)
      assert(!ServingCache.contains(
        "packed#evict-spec#" + TestSpark.sf + "#vec_id#embedding"))
    } finally ServingCache.setMaxBytes(prev)
    val rebuilt = PackedScan
      .buildCached(e, "evict-spec#" + TestSpark.sf, "vec_id", "embedding")
      .topK(q, 10)
    assert(rebuilt.toSeq == first.toSeq)
  }

  test("evictAll unpins everything and drops every entry") {
    val evicted = scala.collection.mutable.Set.empty[String]
    admit("sc-all-a", 10, evicted)
    admit("sc-all-b", 10, evicted)
    ServingCache.evictAll()
    assert(evicted == Set("sc-all-a", "sc-all-b"))
    assert(ServingCache.size == 0)
    assert(ServingCache.totalBytes == 0)
  }

  test("multi-table soak: resident bytes track the budget and answers stay exact across evictions") {
    // The reference's serving workload is several tables resident at once
    // (Wikipedia + ArXiv + per-user KBs); this drives N REAL packed tables
    // through a budget that fits only ~2 of them, twice, and asserts the
    // governor's whole contract: budget held after every admission,
    // evictions actually fire, and an evicted-then-rebuilt table answers
    // bit-identically on every pass.
    val nTables = 5
    val rowsPer = 400L
    val tables = (0 until nTables).map { t =>
      // distinct vec_id range => distinct noise tokens => distinct vectors
      ClusteredCorpus.df(spark, rowsPer, 4)
        .withColumn("vec_id", col("vec_id") + t * 1000000L)
        .select("vec_id", "embedding")
    }
    val keys = (0 until nTables).map(t => s"packed#sc-soak-$t#vec_id#embedding")
    val q = HashEmbedder.embed("soak probe")
    def pass(): IndexedSeq[Seq[(Long, Double)]] =
      (0 until nTables).map { t =>
        val ps = PackedScan.buildCached(tables(t), s"sc-soak-$t", "vec_id", "embedding")
        val res = ps.topK(q, 10).toSeq
        assert(ServingCache.totalBytes <= ServingCache.maxBytes,
          s"over budget after table $t: ${ServingCache.totalBytes}")
        res
      }
    // size one entry, then set the budget to ~2.4 entries
    val probe = PackedScan.build(tables(0), "vec_id", "embedding")
    val entryBytes = probe.bytes
    probe.unpersist()
    withBudget(entryBytes * 12 / 5) {
      ServingCache.evictAll() // start the soak from an empty resident set
      val first = pass()
      val residentAfter = keys.count(ServingCache.contains)
      assert(residentAfter < nTables && residentAfter >= 1,
        s"expected a partial resident set, got $residentAfter of $nTables")
      // table 0 was necessarily evicted to admit later tables => pass 2
      // exercises rebuild-after-eviction on real structures
      assert(!ServingCache.contains(keys.head))
      val second = pass()
      assert(second == first, "rebuilt tables must answer bit-identically")
      first.zip(first.drop(1)).foreach { case (a, b) =>
        assert(a != b, "distinct tables must have distinct answers")
      }
    }
    keys.foreach(ServingCache.evict)
  }

  test("cachedBytes: materialized accumulator beats the fallback; unmaterialized and empty caches never inflate") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"payload-$i" * 10)).toDF("id", "s").cache()
    try {
      // not yet materialized: fall back to the caller's estimate
      assert(ServingCache.cachedBytes(df, fallback = 424242L) == 424242L)
      df.count()
      val actual = ServingCache.cachedBytes(df, fallback = 424242L)
      assert(actual != 424242L, "must read the accumulator, not the fallback")
      assert(actual > 0L)
    } finally df.unpersist()

    // empty-but-materialized cache: actual size is 0 (or the fallback if
    // the buffers never load) — NEVER an inflated plan estimate
    val empty = spark.range(0).toDF("id").cache()
    try {
      empty.count()
      val got = ServingCache.cachedBytes(empty, fallback = 777L)
      assert(got == 0L || got == 777L, s"inflated estimate leaked: $got")
    } finally empty.unpersist()
  }
}
