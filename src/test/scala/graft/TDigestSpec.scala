package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.TDigest

/** t-digest sketch: rank accuracy against the exact empirical quantile,
  * bounded state, split-merge consistency (the partial-aggregation path),
  * serialization round-trip, and the SQL surface.
  */
class TDigestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Rank error of `v` against the empirical CDF, tie-aware: with heavy
    * ties a value OCCUPIES a rank interval [P(X < v), P(X <= v)] and the
    * error is the distance from q to that interval (0 when q falls inside
    * — any estimator must return some tied value there).
    */
  private def rankErr(sorted: Array[Double], v: Double, q: Double): Double = {
    def bound(strict: Boolean): Int = {
      var lo = 0
      var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val below = if (strict) sorted(mid) < v else sorted(mid) <= v
        if (below) lo = mid + 1 else hi = mid
      }
      lo
    }
    val lowR = bound(strict = true).toDouble / sorted.length
    val highR = bound(strict = false).toDouble / sorted.length
    math.max(0.0, math.max(lowR - q, q - highR))
  }

  private def assertRankErr(data: Array[Double], d: TDigest, tol: Double): Unit = {
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = d.quantile(q)
      val err = rankErr(sorted, est, q)
      assert(err <= tol, s"rank error $err at q=$q (est=$est)")
    }
  }

  test("rank error within 0.01 on uniform, lognormal, and discrete data") {
    val rnd = new scala.util.Random(7)
    val uniform = Array.fill(100000)(rnd.nextDouble() * 1000.0)
    val lognorm = Array.fill(100000)(math.exp(rnd.nextGaussian() * 2.0))
    val discrete = Array.fill(100000)(rnd.nextInt(20).toDouble)
    for (data <- Seq(uniform, lognorm, discrete)) {
      val d = new TDigest(200.0)
      data.foreach(d.add(_))
      assertRankErr(data, d, 0.01)
    }
  }

  test("state stays O(compression) regardless of input size") {
    val d = new TDigest(200.0)
    (0 until 500000).foreach(i => d.add((i * 2654435761L % 1000003L).toDouble))
    d.compress()
    assert(d.centroidCount < 400, s"centroid count ${d.centroidCount} should stay well under 2*delta")
    assert(d.serialize().length < 400 * 16 + 16)
  }

  test("split/merge (partial aggregation) keeps the rank bound") {
    val rnd = new scala.util.Random(13)
    val data = Array.fill(80000)(rnd.nextGaussian() * 50.0 + 200.0)
    // 8 partitions, each its own digest, merged pairwise then serialized
    // through the wire format — the exact shuffle path shape
    val parts = data.grouped(10000).map { chunk =>
      val p = new TDigest(200.0)
      chunk.foreach(p.add(_))
      TDigest.deserialize(p.serialize())
    }.toSeq
    val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
    assertRankErr(data, merged, 0.012)
  }

  test("edge cases: empty, single value, constant column") {
    val e = new TDigest(200.0)
    assert(e.quantile(0.5).isNaN)
    val one = new TDigest(200.0)
    one.add(42.0)
    assert(one.quantile(0.0) === 42.0 && one.quantile(1.0) === 42.0)
    val const = new TDigest(200.0)
    (0 until 10000).foreach(_ => const.add(7.5))
    assert(const.quantile(0.25) === 7.5 && const.quantile(0.99) === 7.5)
    // NaN inputs are skipped, not propagated
    val withNan = new TDigest(200.0)
    withNan.add(Double.NaN)
    withNan.add(1.0)
    assert(withNan.quantile(0.5) === 1.0)
  }

  test("SQL surface: scalar, array form, and null skip") {
    GraftSession.install(spark)
    import spark.implicits._
    (1 to 1000).map(i => (i % 3, Some(i.toDouble)))
      .padTo(1010, (0, Option.empty[Double]))
      .toDF("g", "v").createOrReplaceTempView("td_sql")
    val r = spark.sql("""
      SELECT quantileTDigest(v, 0.5) AS m,
             quantilesTDigest(v, 0.25, 0.75) AS qs,
             medianTDigest(v) AS md
      FROM td_sql""").head()
    assert(math.abs(r.getDouble(0) - 500.0) < 15.0)
    val qs = r.getSeq[Double](1)
    assert(math.abs(qs(0) - 250.0) < 15.0 && math.abs(qs(1) - 750.0) < 15.0)
    assert(math.abs(r.getDouble(2) - r.getDouble(0)) < 20.0)
  }
}
