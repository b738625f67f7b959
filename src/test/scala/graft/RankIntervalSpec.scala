package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Rank statistics (Spearman, KS, Mann–Whitney), interval sweeps, mode,
  * and boundingRatio: hand-computed closed forms and the determinism
  * contracts.
  */
class RankIntervalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  test("rankCorr: classic Spearman with and without ties") {
    // x=1..5, y=(2,1,4,3,5): rho = 1 - 6*4/120 = 0.8
    spark.sql("""
      SELECT x, y FROM VALUES (1,2),(2,1),(3,4),(4,3),(5,5) AS t(x, y)""")
      .createOrReplaceTempView("rc1")
    assert(math.abs(
      spark.sql("SELECT rankCorr(x, y) FROM rc1").head().getDouble(0) - 0.8) < 1e-12)
    // tied values, perfectly monotone -> 1
    spark.sql("""
      SELECT x, y FROM VALUES (1,10),(2,20),(2,20),(3,40) AS t(x, y)""")
      .createOrReplaceTempView("rc2")
    assert(math.abs(
      spark.sql("SELECT rankCorr(x, y) FROM rc2").head().getDouble(0) - 1.0) < 1e-12)
    // anti-monotone -> -1
    spark.sql("SELECT x, 10 - x AS y FROM VALUES (1),(2),(3),(4) AS t(x)")
      .createOrReplaceTempView("rc3")
    assert(math.abs(
      spark.sql("SELECT rankCorr(x, y) FROM rc3").head().getDouble(0) + 1.0) < 1e-12)
  }

  test("kolmogorovSmirnovTest: D and asymptotic p") {
    // s0={1..4}, s1={3..6}: D = 0.5; p (Stephens lambda) = 0.534415719...
    spark.sql("""
      SELECT v, s FROM VALUES
        (1D,0),(2D,0),(3D,0),(4D,0),(3D,1),(4D,1),(5D,1),(6D,1) AS t(v, s)""")
      .createOrReplaceTempView("ks1")
    val r = spark.sql("SELECT kolmogorovSmirnovTest(v, s) AS k FROM ks1")
      .selectExpr("k.d_statistic", "k.p_value").head()
    assert(r.getDouble(0) === 0.5)
    assert(math.abs(r.getDouble(1) - 0.5344157192165071) < 1e-12)
    // identical samples -> D = 0, p = 1
    spark.sql("""
      SELECT v, s FROM VALUES (1D,0),(2D,0),(1D,1),(2D,1) AS t(v, s)""")
      .createOrReplaceTempView("ks2")
    val r2 = spark.sql("SELECT kolmogorovSmirnovTest(v, s) AS k FROM ks2")
      .selectExpr("k.d_statistic", "k.p_value").head()
    assert(r2.getDouble(0) === 0.0 && r2.getDouble(1) === 1.0)
  }

  test("mannWhitneyUTest: disjoint samples, tie-corrected p") {
    // s0={1,2,3}, s1={4,5,6}: U = 0, z = -1.96396, p = 0.0495346...
    spark.sql("""
      SELECT v, s FROM VALUES
        (1D,0),(2D,0),(3D,0),(4D,1),(5D,1),(6D,1) AS t(v, s)""")
      .createOrReplaceTempView("mw1")
    val r = spark.sql("SELECT mannWhitneyUTest(v, s) AS m FROM mw1")
      .selectExpr("m.u_statistic", "m.p_value").head()
    assert(r.getDouble(0) === 0.0)
    assert(math.abs(r.getDouble(1) - 0.049534609090139785) < 1e-9)
  }

  test("interval sweeps: max concurrency, position, union length") {
    // ends exclusive: (1,5),(2,6),(5,8) peaks at 2 with 2 concurrent
    spark.sql("""
      SELECT s, e FROM VALUES (1L,5L),(2L,6L),(5L,8L) AS t(s, e)""")
      .createOrReplaceTempView("iv1")
    val r = spark.sql("""
      SELECT maxIntersections(s, e), maxIntersectionsPosition(s, e),
             intervalLengthSum(s, e) FROM iv1""").head()
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 7L) // [1,8) fully covered
    // touching intervals don't stack; disjoint union length
    spark.sql("""
      SELECT s, e FROM VALUES (1L,3L),(3L,5L),(7L,9L) AS t(s, e)""")
      .createOrReplaceTempView("iv2")
    val r2 = spark.sql("""
      SELECT maxIntersections(s, e), intervalLengthSum(s, e) FROM iv2""").head()
    assert(r2.getLong(0) == 1L)
    assert(r2.getLong(1) == 6L)
    // degenerate/negative intervals contribute nothing
    spark.sql("SELECT s, e FROM VALUES (5L,5L),(6L,2L),(1L,2L) AS t(s, e)")
      .createOrReplaceTempView("iv3")
    assert(spark.sql("SELECT intervalLengthSum(s, e) FROM iv3")
      .head().getLong(0) == 1L)
  }

  test("modeExact/anyHeavy: deterministic tie-break to smallest") {
    spark.sql("""
      SELECT x FROM VALUES (3),(3),(-5),(-5),(9) AS t(x)""")
      .createOrReplaceTempView("md1")
    assert(spark.sql("SELECT modeExact(x) FROM md1").head().getInt(0) == -5)
    spark.sql("""
      SELECT x FROM VALUES ('b'),('b'),('a'),('a'),('c') AS t(x)""")
      .createOrReplaceTempView("md2")
    assert(spark.sql("SELECT anyHeavy(x) FROM md2").head().getString(0) == "a")
  }

  test("boundingRatio: slope between the extreme-x points") {
    spark.sql("""
      SELECT x, y FROM VALUES (0D,1D),(2D,5D),(10D,31D) AS t(x, y)""")
      .createOrReplaceTempView("br1")
    assert(spark.sql("SELECT boundingRatio(x, y) FROM br1")
      .head().getDouble(0) === 3.0)
  }

  test("rank/interval family: partitioning-independent") {
    val res = Seq(1, 7).map { p =>
      spark.sql(s"""
        SELECT rankCorr(k % 17, k % 5) AS rc,
               kolmogorovSmirnovTest(CAST(k % 23 AS DOUBLE), CAST(k % 2 AS INT)) AS ks,
               mannWhitneyUTest(CAST(k % 23 AS DOUBLE), CAST(k % 2 AS INT)) AS mw,
               maxIntersections(k % 50, k % 50 + k % 7 + 1) AS mi,
               maxIntersectionsPosition(k % 50, k % 50 + k % 7 + 1) AS mp,
               intervalLengthSum(k % 50, k % 50 + k % 7 + 1) AS il,
               modeExact(k % 13) AS md
        FROM (SELECT /*+ REPARTITION($p) */ id AS k FROM range(3000))""").head()
    }
    assert(res(0) == res(1))
  }
}
