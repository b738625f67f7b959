package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Weighted quantiles/means, AUC, the matrix aggregates, and the
  * window-frame aliases: exact closed forms.
  */
class WeightedMatrixSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  test("quantileExactWeighted: type-1 inverse CDF over repeats") {
    spark.sql("""
      SELECT v, w FROM VALUES (1D, 3L), (2D, 1L), (3D, 1L) AS t(v, w)""")
      .createOrReplaceTempView("wq1")
    val r = spark.sql("""
      SELECT quantileExactWeighted(v, w, 0.5),
             quantileExactWeighted(v, w, 0.8),
             quantileExactWeighted(v, w, 1.0),
             medianExactWeighted(v, w) FROM wq1""").head()
    assert(r.getDouble(0) === 1.0) // cum 3 >= 2.5
    assert(r.getDouble(1) === 2.0) // cum 4 >= 4
    assert(r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === 1.0)
    // zero/negative weights contribute nothing
    spark.sql("SELECT v, w FROM VALUES (9D, 0L), (1D, 2L) AS t(v, w)")
      .createOrReplaceTempView("wq2")
    assert(spark.sql("SELECT quantileExactWeighted(v, w, 1.0) FROM wq2")
      .head().getDouble(0) === 1.0)
  }

  test("avgWeighted and sumCount") {
    spark.sql("SELECT v, w FROM VALUES (1D, 1D), (3D, 3D) AS t(v, w)")
      .createOrReplaceTempView("aw1")
    assert(spark.sql("SELECT avgWeighted(v, w) FROM aw1").head().getDouble(0) === 2.5)
    assert(spark.sql("SELECT avgWeighted(v, 0D) FROM aw1").head().getDouble(0).isNaN)
    val sc = spark.sql("SELECT sumCount(v) AS s FROM aw1")
      .selectExpr("s.sum", "s.count").head()
    assert(sc.getDouble(0) === 4.0 && sc.getLong(1) == 2L)
  }

  test("quantileGK lands within the rank band of exact") {
    val r = spark.sql("""
      SELECT quantileGK(CAST(id AS DOUBLE), 0.5, 1000) AS gk
      FROM range(10000)""").head()
    assert(math.abs(r.getDouble(0) - 5000.0) < 100.0)
  }

  test("arrayAUC: the sklearn classic, ties, and degenerate classes") {
    spark.sql("SELECT 1 AS one").createOrReplaceTempView("dual1")
    assert(math.abs(spark.sql(
      "SELECT arrayAUC(array(0.1D, 0.4D, 0.35D, 0.8D), array(0, 0, 1, 1)) FROM dual1")
      .head().getDouble(0) - 0.75) < 1e-12)
    // perfect separation -> 1
    assert(spark.sql(
      "SELECT arrayAUC(array(0.1D, 0.2D, 0.8D, 0.9D), array(0, 0, 1, 1)) FROM dual1")
      .head().getDouble(0) === 1.0)
    // ties: scores (1,1,2), labels (0,1,1): (1.5 + 3 - 3)/2 = 0.75
    assert(math.abs(spark.sql(
      "SELECT arrayAUC(array(1D, 1D, 2D), array(0, 1, 1)) FROM dual1")
      .head().getDouble(0) - 0.75) < 1e-12)
    // one class empty -> NaN
    assert(spark.sql(
      "SELECT arrayAUC(array(1D, 2D), array(1, 1)) FROM dual1")
      .head().getDouble(0).isNaN)
  }

  test("matrix aggregates: hand 2x2 and perfect correlation") {
    // x=(0,2), y=(1,3): covPop=1, covSamp=2, corr=1
    spark.sql("SELECT x, y FROM VALUES (0D, 1D), (2D, 3D) AS t(x, y)")
      .createOrReplaceTempView("mx1")
    val r = spark.sql("""
      SELECT covarPopMatrix(x, y) AS cp, covarSampMatrix(x, y) AS cs,
             corrMatrix(x, y) AS cr FROM mx1""").head()
    def m(i: Int): Seq[Seq[Double]] =
      r.getSeq[scala.collection.Seq[Double]](i).map(_.toSeq).toSeq
    assert(m(0) == Seq(Seq(1.0, 1.0), Seq(1.0, 1.0)))
    assert(m(1) == Seq(Seq(2.0, 2.0), Seq(2.0, 2.0)))
    assert(m(2) == Seq(Seq(1.0, 1.0), Seq(1.0, 1.0)))
    // 3-column: anti-correlated pair lands at -1
    spark.sql("""
      SELECT CAST(id AS DOUBLE) AS a, CAST(-2 * id AS DOUBLE) AS b,
             CAST(id * id AS DOUBLE) AS c
      FROM range(10)""").createOrReplaceTempView("mx2")
    val c3 = spark.sql("SELECT corrMatrix(a, b, c) AS m FROM mx2").head()
      .getSeq[scala.collection.Seq[Double]](0).map(_.toSeq).toSeq
    assert(math.abs(c3(0)(1) + 1.0) < 1e-12)
    assert(c3(0)(0) === 1.0 && c3(1)(1) === 1.0 && c3(2)(2) === 1.0)
    assert(math.abs(c3(0)(2) - c3(2)(0)) < 1e-15) // symmetric
  }

  test("lagInFrame/leadInFrame: the CH window spellings") {
    val rows = spark.sql("""
      SELECT id, lagInFrame(id) OVER (ORDER BY id) AS lg,
             leadInFrame(id, 2, -1L) OVER (ORDER BY id) AS ld
      FROM range(4) ORDER BY id""").collect()
    assert(rows(0).isNullAt(1) && rows(1).getLong(1) == 0L)
    assert(rows(0).getLong(2) == 2L && rows(3).getLong(2) == -1L)
  }

  test("weighted/matrix family: partitioning-independent") {
    val res = Seq(1, 7).map { p =>
      spark.sql(s"""
        SELECT quantileExactWeighted(CAST(k % 100 AS DOUBLE), k % 5 + 1, 0.9) AS wq,
               corrMatrix(CAST(k % 17 AS DOUBLE), CAST(k % 5 AS DOUBLE)) AS cm
        FROM (SELECT /*+ REPARTITION($p) */ id AS k FROM range(3000))""").head()
    }
    assert(res(0).getDouble(0) === res(1).getDouble(0))
    // corr matrix doubles come from sums merged in partition order; the
    // values are equal to well below the 1e-6 gate the queries use
    val m0 = res(0).getSeq[scala.collection.Seq[Double]](1)
    val m1 = res(1).getSeq[scala.collection.Seq[Double]](1)
    m0.zip(m1).foreach { case (r0, r1) =>
      r0.zip(r1).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }
}
