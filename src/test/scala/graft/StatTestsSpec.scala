package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hypothesis tests, categorical association, and the time-series
  * aggregates: exact closed forms (t/p constants cross-checked against
  * published t-tables: p(t=2, df=10) = 0.0733880), hand-computed
  * contingency tables, the LTTB spike-keeping case, and partitioning
  * independence.
  */
class StatTestsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  test("studentTTest / welchTTest: exact t and p on a known pair") {
    // sample0 = {1..5} (m=3, s2=2.5), sample1 = {2,4,..,10} (m=6, s2=10)
    spark.sql("""
      SELECT v, s FROM VALUES
        (1D,0),(2D,0),(3D,0),(4D,0),(5D,0),
        (2D,1),(4D,1),(6D,1),(8D,1),(10D,1) AS t(v, s)""")
      .createOrReplaceTempView("tt1")
    val r = spark.sql("""
      SELECT studentTTest(v, s) AS st, welchTTest(v, s) AS wt FROM tt1""")
      .selectExpr("st.t_stat", "st.p_value", "wt.t_stat", "wt.p_value").head()
    assert(math.abs(r.getDouble(0) - (-1.8973665961010275)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.09434977284243774) < 1e-10)
    assert(math.abs(r.getDouble(2) - (-1.8973665961010275)) < 1e-12)
    // Welch df = 5.88235...: p differs from the pooled test
    assert(math.abs(r.getDouble(3) - 0.10753119493062714) < 1e-10)
  }

  test("studentP matches the published t-table") {
    assert(math.abs(
      org.apache.spark.sql.graft.SpecialMath.studentP(2.0, 10.0)
        - 0.0733880347707) < 1e-10)
    assert(math.abs(
      org.apache.spark.sql.graft.SpecialMath.studentP(1.96, 1e6) - 0.05) < 1e-4)
  }

  test("meanZTest: known-variance z and normal p") {
    // m0=2, m1=5, varX=varY=1: z = -3/sqrt(2/3) = -3.674234614...
    spark.sql("""
      SELECT v, s FROM VALUES
        (1D,0),(2D,0),(3D,0),(4D,1),(5D,1),(6D,1) AS t(v, s)""")
      .createOrReplaceTempView("zt1")
    val r = spark.sql("SELECT meanZTest(v, s, 1.0, 1.0) AS z FROM zt1")
      .selectExpr("z.z_stat", "z.p_value").head()
    assert(math.abs(r.getDouble(0) - (-3.6742346141747673)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.00023856347510022778) < 1e-12)
  }

  test("cramersV / contingency / biasCorrected: hand-computed 2x2") {
    // cells (a,a)=2 (a,b)=1 (b,a)=1 (b,b)=2: chi2 = 2/3, V = 1/3,
    // C = sqrt(chi2/(chi2+n)) = sqrt(0.1); bias-corrected clamps to 0.
    spark.sql("""
      SELECT x, y FROM VALUES
        ('a','a'),('a','a'),('a','b'),('b','a'),('b','b'),('b','b')
        AS t(x, y)""").createOrReplaceTempView("ct1")
    val r = spark.sql("""
      SELECT cramersV(x, y), contingency(x, y), cramersVBiasCorrected(x, y)
      FROM ct1""").head()
    assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(0.1)) < 1e-12)
    assert(r.getDouble(2) === 0.0)
  }

  test("cramersV: perfect association = 1, independence = 0") {
    spark.sql("""
      SELECT x, x AS y FROM VALUES ('a'),('b'),('c'),('a') AS t(x)""")
      .createOrReplaceTempView("ct2")
    assert(spark.sql("SELECT cramersV(x, y) FROM ct2").head().getDouble(0) === 1.0)
    spark.sql("""
      SELECT x, y FROM VALUES
        ('a','p'),('a','q'),('b','p'),('b','q') AS t(x, y)""")
      .createOrReplaceTempView("ct3")
    assert(spark.sql("SELECT cramersV(x, y) FROM ct3").head().getDouble(0) === 0.0)
  }

  test("theilsU: functional dependence = 1, independence = 0, units cancel") {
    // X determined by Y -> H(X|Y)=0 -> U=1
    spark.sql("""
      SELECT upper(y) AS x, y FROM VALUES ('p'),('q'),('p'),('r') AS t(y)""")
      .createOrReplaceTempView("tu1")
    assert(spark.sql("SELECT theilsU(x, y) FROM tu1").head().getDouble(0) === 1.0)
    spark.sql("""
      SELECT x, y FROM VALUES
        ('a','p'),('a','q'),('b','p'),('b','q') AS t(x, y)""")
      .createOrReplaceTempView("tu2")
    assert(math.abs(
      spark.sql("SELECT theilsU(x, y) FROM tu2").head().getDouble(0)) < 1e-15)
    // constant X: H(X)=0 -> defined 0
    spark.sql("SELECT 'k' AS x, y FROM VALUES ('p'),('q') AS t(y)")
      .createOrReplaceTempView("tu3")
    assert(spark.sql("SELECT theilsU(x, y) FROM tu3").head().getDouble(0) === 0.0)
  }

  test("exponentialMovingAverage: telescoped closed form") {
    // keys 0,1,2 values 4,2,1; halfLife 1: weights 1/4,1/2,1
    // ema = (1 + 1 + 1) / (7/4) = 12/7
    spark.sql("""
      SELECT k, v FROM VALUES (0L,4D),(1L,2D),(2L,1D) AS t(k, v)""")
      .createOrReplaceTempView("ema1")
    val r = spark.sql(
      "SELECT exponentialMovingAverage(k, v, 1.0) FROM ema1").head()
    assert(math.abs(r.getDouble(0) - 12.0 / 7.0) < 1e-15)
  }

  test("lttb: keeps the spikes, pins first/last") {
    // y=0 except spikes at x=3 (+100) and x=7 (-50); n=4 must keep both
    spark.sql("""
      SELECT id AS x, CASE WHEN id = 3 THEN 100D WHEN id = 7 THEN -50D
                           ELSE 0D END AS y
      FROM range(10)""").createOrReplaceTempView("lt1")
    val r = spark.sql("""
      SELECT transform(largestTriangleThreeBuckets(x, y, 4),
                       p -> concat(CAST(p.x AS INT), ':', CAST(p.y AS INT)))
      FROM lt1""").head()
    assert(r.getSeq[String](0) == Seq("0:0", "3:100", "7:-50", "9:0"))
  }

  test("sparkbar: ladder levels, spaces for empty, explicit bounds") {
    // keys 0..3 one per bucket at width 4; sums 1,2,4,8 -> levels
    // ceil(8s/8) = 1,2,4,8 -> chars 1st, 2nd, 4th, 8th of the ladder
    spark.sql("""
      SELECT k, v FROM VALUES (0L,1D),(1L,2D),(2L,4D),(3L,8D) AS t(k, v)""")
      .createOrReplaceTempView("sb1")
    assert(spark.sql("SELECT sparkbar(k, v, 4) FROM sb1").head().getString(0)
      == "▁▂▄█")
    // explicit bounds widen the axis: data only in the first half
    assert(spark.sql("SELECT sparkbar(k, v, 8, 0, 7) FROM sb1").head().getString(0)
      == "▁▂▄█    ")
    // zero bucket renders as space
    spark.sql("SELECT k, v FROM VALUES (0L,5D),(1L,0D),(2L,5D) AS t(k, v)")
      .createOrReplaceTempView("sb2")
    assert(spark.sql("SELECT sparkbar(k, v, 3) FROM sb2").head().getString(0)
      == "█ █")
  }

  test("lttb: n >= size or n <= 2 returns the full sorted series") {
    spark.sql("SELECT id AS x, CAST(id * 2 AS DOUBLE) AS y FROM range(4)")
      .createOrReplaceTempView("lt2")
    val full = spark.sql(
      "SELECT size(lttb(x, y, 10)), size(lttb(x, y, 2)) FROM lt2").head()
    assert(full.getInt(0) == 4 && full.getInt(1) == 4)
  }

  test("stat tests and series aggs: partitioning-independent") {
    val res = Seq(1, 7).map { p =>
      spark.sql(s"""
        SELECT studentTTest(v, s) AS st, welchTTest(v, s) AS wt,
               cramersV(CAST(k % 5 AS STRING), CAST(k % 3 AS STRING)) AS cv,
               theilsU(CAST(k % 5 AS STRING), CAST(k % 3 AS STRING)) AS tu,
               exponentialMovingAverage(k, v, 100.0) AS ema,
               largestTriangleThreeBuckets(k, v, 7) AS lt
        FROM (SELECT /*+ REPARTITION($p) */ id AS k,
                     CAST(id % 17 AS DOUBLE) AS v, CAST(id % 2 AS INT) AS s
              FROM range(2000))""").head()
    }
    assert(res(0) == res(1))
  }
}
