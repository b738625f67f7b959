package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QueryLog

/** Gates for the system.query_log analog: success + failure recording,
  * row metrics, bounded ring, and SQL access through the temp view.
  */
class QueryLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("records successes with duration and row metric; failures with error") {
    QueryLog.clear()
    QueryLog.install(spark)
    QueryLog.install(spark) // idempotent

    spark.range(0, 123).toDF("id").collect()
    // listener events are posted asynchronously
    var tries = 0
    while (QueryLog.log(spark).isEmpty && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val ok = QueryLog.log(spark).filter($"status" === "QueryFinish").collect()
    assert(ok.nonEmpty)
    val e = ok.head
    assert(e.getAs[Double]("duration_ms") >= 0.0)

    // a failing action lands as ExceptionWhileProcessing
    intercept[Exception] {
      spark.range(0, 10).selectExpr("assert_true(id < 5, 'boom')", "id").collect()
    }
    tries = 0
    while (QueryLog.log(spark).filter($"status" === "ExceptionWhileProcessing")
        .isEmpty && tries < 50) {
      Thread.sleep(100); tries += 1
    }
    val bad = QueryLog.log(spark)
      .filter($"status" === "ExceptionWhileProcessing").collect()
    assert(bad.nonEmpty)

    // the log is itself queryable through SQL (view refreshed by log())
    QueryLog.log(spark)
    val n = spark.sql(
      "SELECT count(*) FROM system_query_log WHERE status = 'QueryFinish'")
      .collect()(0).getLong(0)
    assert(n >= 1)
  }
}
