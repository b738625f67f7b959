package graft

import org.apache.spark.sql.SparkSession

/** Plan evidence for the expensive/novel query families: prints the
  * executed plan head for each audited query AND asserts the
  * 100 TB-shape invariants mechanically — partial aggregation before
  * the exchange (facts never cross the wire raw), no more exchanges
  * than the query's shape requires, and map-only scoring where the
  * operator promises it. Run: `sbt "runMain graft.ExplainAudit"`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val dir = "/root/testdata/sf0.01"

    var failures = 0
    def audit(name: String, maxExchanges: Int, mustContain: Seq[String] = Nil,
        mustNotContain: Seq[String] = Nil): Unit = {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(s"===== $name: $exchanges Exchange node(s) =====")
      println(plan.linesIterator.take(18).mkString("\n"))
      if (exchanges > maxExchanges) {
        failures += 1
        println(s"AUDIT FAIL: $name has $exchanges exchanges (allowed $maxExchanges)")
      }
      mustContain.foreach { s =>
        if (!plan.contains(s)) {
          failures += 1
          println(s"AUDIT FAIL: $name plan missing '$s'")
        }
      }
      mustNotContain.foreach { s =>
        if (plan.contains(s)) {
          failures += 1
          println(s"AUDIT FAIL: $name plan must not contain '$s'")
        }
      }
    }

    // statistics batteries (round 10): partial agg before the exchange
    audit("q201_stat_tests", maxExchanges = 2,
      mustContain = Seq("partial_"))
    audit("q207_matrix_stats", maxExchanges = 3)
    audit("q198_entropy", maxExchanges = 3)
    // round-11 dialect batteries: one scan, the only exchange is the
    // ORDER BY's range partitioning (plus AQE's read node)
    audit("q214_math_bits", maxExchanges = 1, mustNotContain = Seq("Join"))
    audit("q217_vector_norms", maxExchanges = 1, mustNotContain = Seq("Join"))
    // langid: scoring is a PROJECTION (the LangScore fold) — the plan may
    // shuffle only for the final join/sort, never to re-aggregate grams
    audit("q213_langid", maxExchanges = 5,
      mustContain = Seq("lang_score"), mustNotContain = Seq("explode(transform"))
    // ordered-collection aggregates: ONE aggregation exchange + sort
    audit("q219_ordered_collect", maxExchanges = 3,
      mustContain = Seq("partial_"))
    // WITH TOTALS → GROUPING SETS: ONE Expand + ONE aggregation pass
    // (partial before the exchange), never the naive UNION of two
    // aggregates — at 100 TB that union would double the scan
    audit("q225_chsql_with_totals", maxExchanges = 2,
      mustContain = Seq("Expand", "partial_"),
      mustNotContain = Seq("Join", "Union"))
    // ARRAY JOIN → Generate (explode), never a join; one agg exchange,
    // top-k via TakeOrdered (no global-sort exchange)
    audit("q222_chsql_array_join", maxExchanges = 2,
      mustContain = Seq("Generate", "partial_"),
      mustNotContain = Seq("Join"))

    println(if (failures == 0) "ALL PLAN AUDITS PASS"
      else s"$failures AUDIT FAILURE(S)")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
