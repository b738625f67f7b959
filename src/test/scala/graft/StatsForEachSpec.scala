package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The statistical-moment dialect (skewPop/skewSamp/kurtPop/kurtSamp,
  * simpleLinearRegression) and the -ForEach combinator family: exact
  * closed forms on hand-built distributions, the ClickHouse ragged rule,
  * and partitioning-independence for the order-insensitive ops.
  */
class StatsForEachSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  test("moments: closed forms on a known distribution") {
    // x = {0,0,0,3}: mu=0.75; central moments (/n): m2=1.6875,
    // m3=2.53125, m4=6.64453125. skewPop=m3/m2^1.5, kurtPop=m4/m2^2.
    spark.sql("SELECT explode(array(0D, 0D, 0D, 3D)) AS x")
      .createOrReplaceTempView("m1")
    val r = spark.sql("""
      SELECT skewPop(x) AS sp, skewSamp(x) AS ss,
             kurtPop(x) AS kp, kurtSamp(x) AS ks FROM m1""").head()
    val m2 = 1.6875; val m3 = 2.53125; val m4 = 6.64453125
    assert(math.abs(r.getDouble(0) - m3 / math.pow(m2, 1.5)) < 1e-12)
    assert(math.abs(r.getDouble(1) -
      m3 / math.pow(m2, 1.5) * math.pow(3.0 / 4.0, 1.5)) < 1e-12)
    assert(math.abs(r.getDouble(2) - m4 / (m2 * m2)) < 1e-12)
    assert(math.abs(r.getDouble(3) - m4 / (m2 * m2) * 9.0 / 16.0) < 1e-12)
  }

  test("moments: symmetric two-point distribution") {
    // x = {-1, 1}: skew 0; kurtPop = 1 (m4=1, m2=1); kurtSamp = 1/4.
    spark.sql("SELECT explode(array(-1D, 1D)) AS x").createOrReplaceTempView("m2")
    val r = spark.sql(
      "SELECT skewPop(x), kurtPop(x), kurtSamp(x) FROM m2").head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 0.25)
  }

  test("simpleLinearRegression recovers an exact line") {
    spark.sql("""
      SELECT x, 3.5D * x - 2.0D AS y
      FROM (SELECT explode(sequence(0, 9)) AS x)""")
      .createOrReplaceTempView("lin")
    val r = spark.sql(
      "SELECT simpleLinearRegression(CAST(x AS DOUBLE), y) AS f FROM lin")
      .selectExpr("f.k", "f.b").head()
    assert(math.abs(r.getDouble(0) - 3.5) < 1e-12)
    assert(math.abs(r.getDouble(1) + 2.0) < 1e-12)
  }

  test("ForEach family: exact position-wise values") {
    spark.sql("""
      SELECT * FROM VALUES
        (array(1D, 10D, 100D)), (array(2D, 20D, 200D)), (array(3D, 30D, 300D))
        AS t(a)""").createOrReplaceTempView("fe1")
    val r = spark.sql("""
      SELECT sumForEach(a) AS s, minForEach(a) AS mn, maxForEach(a) AS mx,
             avgForEach(a) AS av, countForEach(a) AS c FROM fe1""").head()
    assert(r.getSeq[Double](0) == Seq(6.0, 60.0, 600.0))
    assert(r.getSeq[Double](1) == Seq(1.0, 10.0, 100.0))
    assert(r.getSeq[Double](2) == Seq(3.0, 30.0, 300.0))
    assert(r.getSeq[Double](3) == Seq(2.0, 20.0, 200.0))
    assert(r.getSeq[Long](4) == Seq(3L, 3L, 3L))
  }

  test("ForEach ragged rule: short arrays stop contributing") {
    spark.sql("""
      SELECT * FROM VALUES
        (array(1D)), (array(2D, 20D)), (array(3D, 30D, 300D))
        AS t(a)""").createOrReplaceTempView("fe2")
    val r = spark.sql("""
      SELECT sumForEach(a) AS s, countForEach(a) AS c,
             minForEach(a) AS mn, avgForEach(a) AS av FROM fe2""").head()
    assert(r.getSeq[Double](0) == Seq(6.0, 50.0, 300.0))
    assert(r.getSeq[Long](1) == Seq(3L, 2L, 1L))
    assert(r.getSeq[Double](2) == Seq(1.0, 20.0, 300.0))
    assert(r.getSeq[Double](3) == Seq(2.0, 25.0, 300.0))
  }

  test("ForEach: nulls skipped, empty input yields empty array") {
    spark.sql("""
      SELECT * FROM VALUES
        (array(1D, CAST(NULL AS DOUBLE))), (CAST(NULL AS ARRAY<DOUBLE>)),
        (array(5D, 7D))
        AS t(a)""").createOrReplaceTempView("fe3")
    val r = spark.sql(
      "SELECT sumForEach(a) AS s, countForEach(a) AS c FROM fe3").head()
    assert(r.getSeq[Double](0) == Seq(6.0, 7.0))
    assert(r.getSeq[Long](1) == Seq(2L, 1L))
    val empty = spark.sql(
      "SELECT countForEach(a) FROM fe3 WHERE size(a) > 99").head()
    assert(empty.getSeq[Long](0).isEmpty)
  }

  test("ForEach min/max/count: partitioning-independent (exact ops)") {
    val res = Seq(1, 7).map { p =>
      spark.sql(s"""
        SELECT minForEach(a) AS mn, maxForEach(a) AS mx, countForEach(a) AS c
        FROM (SELECT /*+ REPARTITION($p) */ array(CAST(id % 13 AS DOUBLE),
                     CAST(id % 7 AS DOUBLE)) AS a
              FROM range(1000))""").head()
    }
    assert(res(0) == res(1))
  }
}
