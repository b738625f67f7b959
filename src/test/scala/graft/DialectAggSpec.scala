package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** The ClickHouse aggregate-combinator and date/time dialect shims
  * (Registry round-9 additions) pinned on hand-computable data — the SQL
  * names q154–q157 gate against DuckDB are checked here for their exact
  * semantics (null handling of the -If family, ISO weekday numbering,
  * interpolated quantiles, HLL error envelope, the any/anyLast contract
  * the oracle can't gate).
  */
class DialectAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sql1(q: String): Row = { GraftSession.install(spark); spark.sql(q).head() }

  test("-If combinators: condition filters, not masks, and empty sets are null") {
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("id", "v").createOrReplaceTempView("t_if")
    val r = sql1("""
      SELECT countIf(v > 15.0) AS c, sumIf(v, id % 2 = 0) AS s,
             avgIf(v, v > 100.0) AS a, minIf(v, id >= 3) AS mn,
             maxIf(v, id <= 2) AS mx
      FROM t_if""")
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 60.0)
    assert(r.isNullAt(2), "avgIf over an empty set must be NULL, not NaN/0")
    assert(r.getDouble(3) === 30.0)
    assert(r.getDouble(4) === 20.0)
  }

  test("argMax/argMin/uniqExact/any/anyLast") {
    Seq((1L, 5.0, "a"), (2L, 9.0, "b"), (3L, 1.0, "a"), (4L, 9.5, "b"))
      .toDF("id", "v", "g").createOrReplaceTempView("t_arg")
    val r = sql1("""
      SELECT argMax(id, v) AS amax, argMin(id, v) AS amin,
             uniqExact(g) AS u FROM t_arg""")
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L && r.getLong(2) === 2L)
    // any/anyLast: SOME member value (order non-deterministic by contract;
    // on a 1-row group both are pinned exactly)
    val one = sql1("SELECT any(g) AS a, anyLast(g) AS l FROM t_arg WHERE id = 2")
    assert(one.getString(0) === "b" && one.getString(1) === "b")
    val memb = sql1("SELECT any(g) AS a, anyLast(g) AS l FROM t_arg")
    assert(Set("a", "b").contains(memb.getString(0)))
    assert(Set("a", "b").contains(memb.getString(1)))
  }

  test("quantileExact interpolates like DuckDB quantile_cont") {
    Seq(1.0, 2.0, 3.0, 4.0).toDF("v").createOrReplaceTempView("t_q")
    val r = sql1("""
      SELECT quantileExact(v, 0.5) AS p50, medianExact(v) AS med,
             quantileExact(v, 0.25) AS p25, quantileExact(v, 1.0) AS p100
      FROM t_q""")
    // sorted [1,2,3,4]: p50 = 2.5 (interpolated), p25 at index 0.75 = 1.75
    assert(r.getDouble(0) === 2.5 && r.getDouble(1) === 2.5)
    assert(r.getDouble(2) === 1.75)
    assert(r.getDouble(3) === 4.0)
  }

  test("uniq (HLL++) lands within 5% of the exact distinct count") {
    spark.range(100000).selectExpr("id % 5000 AS k")
      .createOrReplaceTempView("t_u")
    val r = sql1("SELECT uniq(k) AS u, uniqExact(k) AS e FROM t_u")
    val (u, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(e === 5000.0)
    assert(math.abs(u - e) / e < 0.05, s"uniq=$u exact=$e")
  }

  test("sumMap: sorted unique keys, pairwise merge, null and length handling") {
    import org.apache.spark.sql.Row
    // 8 partitions force real partial/merge paths through the tree buffer
    val df = spark.range(0, 1000, 1, 8)
      .selectExpr(
        "array(CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, 'all') AS ks",
        "array(CAST(id AS DOUBLE), CAST(id AS DOUBLE)) AS vs")
    df.createOrReplaceTempView("t_sm")
    val r = sql1("SELECT sumMap(ks, vs) AS sm FROM t_sm").getStruct(0)
    val keys = r.getSeq[String](0)
    val vals = r.getSeq[Double](1)
    assert(keys === Seq("all", "even", "odd"))
    val total = (0 until 1000).map(_.toDouble).sum
    val even = (0 until 1000 by 2).map(_.toDouble).sum
    assert(vals === Seq(total, even, total - even))
    // long keys sort numerically; mismatched lengths take min(len) pairs;
    // null slots skipped
    Seq((Seq(10L, 2L), Seq(1.0, 2.0)), (Seq(2L), Seq(5.0, 99.0)),
      (Seq(10L, 3L), Seq(4.0, 6.0)))
      .toDF("ks", "vs").createOrReplaceTempView("t_sm2")
    val r2 = sql1("SELECT sumMap(ks, vs) AS sm FROM t_sm2").getStruct(0)
    assert(r2.getSeq[Long](0) === Seq(2L, 3L, 10L))
    assert(r2.getSeq[Double](1) === Seq(7.0, 6.0, 5.0))
    val r3 = sql1(
      "SELECT sumMap(array('a', NULL), array(1.0, 2.0)) AS sm FROM range(3)")
      .getStruct(0)
    assert(r3.getSeq[String](0) === Seq("a"))
    assert(r3.getSeq[Double](1) === Seq(3.0))
  }

  test("array dialect edges: empty arrays, compact, enumerate, push, hasAll") {
    val r = sql1("""
      SELECT
        arrayCompact(array(1, 1, 2, 2, 2, 1, 3, 3)) AS c,
        arrayEnumerate(array()) AS e0,
        arrayEnumerate(array('a', 'b')) AS e2,
        arraySum(array(1.5, 2.5)) AS s,
        arrayAvg(array(2, 4, 6)) AS a,
        arrayPushBack(array(1, 2), 3) AS pb,
        arrayPushFront(array(2, 3), 1) AS pf,
        hasAll(array('a', 'b', 'c'), array('c', 'a')) AS ha,
        hasAll(array('a'), array('a', 'z')) AS hz,
        indexOf(array(9, 8, 7), 7) AS ix,
        indexOf(array(9), 1) AS ix0,
        countEqual(array(5, 1, 5, 5), 5) AS ce,
        empty(array()) AS em, notEmpty('x') AS ne,
        arrayStringConcat(array('a', 'b')) AS nosep""")
    assert(r.getSeq[Int](0) === Seq(1, 2, 1, 3))
    assert(r.getSeq[Int](1) === Seq.empty[Int])
    assert(r.getSeq[Int](2) === Seq(1, 2))
    assert(r.getDouble(3) === 4.0)
    assert(r.getDouble(4) === 4.0)
    assert(r.getSeq[Int](5) === Seq(1, 2, 3))
    assert(r.getSeq[Int](6) === Seq(1, 2, 3))
    assert(r.getBoolean(7) === true && r.getBoolean(8) === false)
    assert(r.getLong(9) === 3L && r.getLong(10) === 0L)
    assert(r.getInt(11) === 3)
    assert(r.getBoolean(12) === true && r.getBoolean(13) === true)
    assert(r.getString(14) === "ab")
    // groupUniqArray: set semantics (order not part of the contract)
    val g = sql1(
      "SELECT arraySort(groupUniqArray(v)) AS u FROM VALUES (1),(2),(2),(1),(3) AS t(v)")
    assert(g.getSeq[Int](0) === Seq(1, 2, 3))
  }

  test("topK: exact counts, count-desc value-asc ties, k > cardinality") {
    // 8 partitions force the hash-map merge path; values 0..4 with
    // frequencies 5,4,3,2,1-ish and a deliberate tie
    Seq("b", "b", "a", "a", "c").toDF("v").repartition(8)
      .createOrReplaceTempView("t_tk")
    val r = sql1("SELECT topK(v, 2) AS t2, topK(v, 99) AS all FROM t_tk")
    assert(r.getSeq[String](0) === Seq("a", "b")) // tie 2-2 -> value asc
    assert(r.getSeq[String](1) === Seq("a", "b", "c"))
    val l = sql1(
      "SELECT topK(CAST(id % 3 AS BIGINT), 2) AS t FROM range(10)")
    // counts: 0->4, 1->3, 2->3 -> [0, 1]
    assert(l.getSeq[Long](0) === Seq(0L, 1L))
  }

  test("quantile/quantiles/median: sketch lands within tolerance of exact") {
    spark.range(100001).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("t_qa")
    val r = sql1("""
      SELECT quantile(v, 0.9) AS p90, median(v) AS med,
             quantiles(v, 0.25, 0.75) AS qs,
             quantileExact(v, 0.9) AS e90 FROM t_qa""")
    assert(math.abs(r.getDouble(0) - 90000.0) < 1000.0)
    assert(math.abs(r.getDouble(1) - 50000.0) < 1000.0)
    val qs = r.getSeq[Double](2)
    assert(math.abs(qs(0) - 25000.0) < 1000.0 && math.abs(qs(1) - 75000.0) < 1000.0)
    assert(r.getDouble(3) === 90000.0) // exact leg is exact
  }

  test("limitBy and withFill: group caps, gap densify, empty-input edge") {
    import org.apache.spark.sql.functions._
    import graft.operators.SelectDialect
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 9.0), ("a", 3L, 5.0),
      ("b", 4L, 1.0)).toDF("g", "id", "v")
    val top = SelectDialect.limitBy(df, 1, Seq(col("g")),
      Seq(col("v").desc, col("id").asc))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top === Set(("a", 1L), ("b", 4L))) // tie 9.0-9.0 -> lower id
    // withFill on a numeric-ish axis: timestamps with a 2-day hole
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-05")
      .toDF("s").selectExpr("CAST(s AS TIMESTAMP) AS d", "1L AS n")
    val filled = SelectDialect.withFill(days, "d",
      expr("INTERVAL 1 DAY"), Map("n" -> lit(0L)))
      .collect().map(r => r.getAs[java.sql.Timestamp](0).toString -> r.getLong(1))
    assert(filled.length === 5)
    assert(filled.count(_._2 == 0L) === 2) // Jan 3 + Jan 4 filled
    assert(filled.map(_._1.take(10)) === Array("2024-01-01", "2024-01-02",
      "2024-01-03", "2024-01-04", "2024-01-05"))
    // empty input -> empty output, not a null-spine error
    val empty = SelectDialect.withFill(days.filter(col("n") < 0), "d",
      expr("INTERVAL 1 DAY"), Map("n" -> lit(0L)))
    assert(empty.count() === 0L)
  }

  test("string dialect edges: replaceOne boundaries, extract groups, counts") {
    val r = sql1("""
      SELECT
        replaceOne('aXbXc', 'X', '-') AS r1,
        replaceOne('abc', 'zz', '-') AS rmiss,
        replaceOne('Xbc', 'X', '') AS rhead,
        position('hello', 'zz') AS p0,
        extract('foo123bar', '[0-9]+') AS whole,
        extract('v2024rel', 'v([0-9]+)') AS grp,
        extractAll('a1b22c333', '[0-9]+') AS nums,
        countSubstrings('aaaa', 'aa') AS nonoverlap,
        countMatches('a1b22c', '[0-9]+') AS nm,
        multiSearchAny('haystack', array('zz', 'st')) AS any1,
        multiSearchAny('haystack', array('zz')) AS any0""")
    assert(r.getString(0) === "a-bXc")
    assert(r.getString(1) === "abc")
    assert(r.getString(2) === "bc")
    assert(r.getInt(3) === 0)
    assert(r.getString(4) === "123")
    assert(r.getString(5) === "2024")
    assert(r.getSeq[String](6) === Seq("1", "22", "333"))
    assert(r.getInt(7) === 2) // non-overlapping
    assert(r.getInt(8) === 2)
    assert(r.getBoolean(9) === true && r.getBoolean(10) === false)
  }

  test("array HOF edges: first/firstIndex on miss and empty, cumsum/difference") {
    val r = sql1("""
      SELECT
        arrayFirst(x -> x > 10, array(1, 2, 3)) AS miss,
        arrayFirst(x -> x > 1, array(1, 2, 3)) AS hit,
        arrayFirstIndex(x -> x > 1, array(1, 2, 3)) AS idx,
        arrayFirstIndex(x -> x > 10, array(1, 2, 3)) AS idx0,
        arrayFirstIndex(x -> x > 0, array()) AS idxe,
        arrayCount(x -> x % 2 = 0, array(1, 2, 3, 4)) AS n,
        arrayCumSum(array()) AS cume,
        arrayDifference(array(5)) AS d1,
        arrayUniq(array()) AS u0""")
    assert(r.isNullAt(0))
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 2 && r.getInt(3) === 0 && r.getInt(4) === 0)
    assert(r.getInt(5) === 2)
    assert(r.getSeq[Double](6) === Seq.empty[Double])
    assert(r.getSeq[Double](7) === Seq(0.0))
    assert(r.getInt(8) === 0)
  }

  test("date/time dialect: ISO weekday, yyyymm, boundary dateDiff identity") {
    // 2024-01-01 is a Monday; 2024-01-07 a Sunday
    Seq("2024-01-01 22:30:15", "2024-01-07 01:02:03")
      .toDF("s").selectExpr("CAST(s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("t_d")
    GraftSession.install(spark)
    val rows = spark.sql("""
      SELECT toDayOfWeek(ts) AS dow, toYYYYMM(ts) AS ym,
             toHour(ts) AS hr, toStartOfDay(ts) AS d,
             toUnixTimestamp(ts) AS ut,
             addDays(ts, 1) AS nxt, subtractHours(ts, 2) AS m2,
             timestampdiff(DAY, toStartOfDay(ts),
                           toStartOfDay(addHours(ts, 3))) AS dd3h
      FROM t_d ORDER BY ts""").collect()
    assert(rows(0).getInt(0) === 1 && rows(1).getInt(0) === 7)
    assert(rows(0).getInt(1) === 202401)
    assert(rows(0).getInt(2) === 22)
    assert(rows(0).getAs[java.sql.Timestamp]("d").toInstant ===
      java.time.Instant.parse("2024-01-01T00:00:00Z"))
    assert(rows(0).getLong(4) === 1704148215L)
    // ClickHouse dateDiff counts day BOUNDARIES: 22:30 + 3h crosses one;
    // 01:02 + 3h crosses none
    assert(rows(0).getLong(7) === 1L)
    assert(rows(1).getLong(7) === 0L)
  }

  test("topKWeighted and uniqUpTo: weights, saturation, 16-partition merge") {
    GraftSession.install(spark)
    // one heavy-but-rare value: 'z' appears once with weight 1000
    val df = spark.range(0, 3200).selectExpr(
      "id % 16 AS g",
      "CASE WHEN id = 7 THEN 'z' ELSE concat('v', id % 5) END AS v",
      "CASE WHEN id = 7 THEN 1000L ELSE 1L END AS w",
      "id % 37 AS u").repartition(16)
    df.createOrReplaceTempView("t_tkw")
    val rows = spark.sql("""
      SELECT g, topKWeighted(v, w, 2) AS tw, topK(v, 2) AS tc,
             uniqUpTo(u, 5) AS cap5, uniqUpTo(u, 100) AS exact
      FROM t_tkw GROUP BY g ORDER BY g""").collect()
    // group 7 holds the heavy 'z' (weight 1000 beats ~40 of any other);
    // by plain count 'z' is nowhere near the top
    val g7 = rows(7)
    assert(g7.getSeq[String](1).head == "z")
    assert(!g7.getSeq[String](2).contains("z"))
    // unweighted top list: weight-1 everywhere means tw == tc elsewhere
    assert(rows(0).getSeq[String](1) == rows(0).getSeq[String](2))
    // uniqUpTo: every group sees 37 distinct u values eventually — here
    // each group has 200 rows, u = id % 37 cycles, so distinct u per
    // group is 37: cap5 saturates at 6, exact reports 37
    assert(rows.forall(_.getLong(3) == 6L))
    assert(rows.forall(_.getLong(4) == 37L))
    // null keys are skipped; null weights drop the row (CH contract)
    val n = spark.sql("""
      SELECT topKWeighted(v, w, 3) AS tw, uniqUpTo(v, 9) AS uq FROM (
        SELECT CASE WHEN id % 3 = 0 THEN NULL ELSE concat('k', id % 2) END AS v,
               CASE WHEN id % 5 = 0 THEN NULL ELSE 1L END AS w
        FROM range(30))""").collect()(0)
    assert(n.getSeq[String](0).toSet == Set("k0", "k1"))
    assert(n.getLong(1) == 2L)
  }

  test("minMap/maxMap: per-key extremes across a multi-partition merge") {
    GraftSession.install(spark)
    val rows = spark.sql("""
      SELECT g, minMap(ks, vs) AS mn, maxMap(ks, vs) AS mx FROM (
        SELECT id % 2 AS g,
          array(concat('k', id % 3), 'all') AS ks,
          array(CAST(id AS DOUBLE), CAST(id AS DOUBLE)) AS vs
        FROM range(100) DISTRIBUTE BY id % 8)
      GROUP BY g ORDER BY g""").collect()
    // g=0: even ids 0..98. k0 holds ids ≡0 (mod 6): min 0, max 96
    val r0 = rows(0).getStruct(1)
    assert(r0.getSeq[String](0) == Seq("all", "k0", "k1", "k2"))
    assert(r0.getSeq[Double](1) == Seq(0.0, 0.0, 4.0, 2.0))
    val x0 = rows(0).getStruct(2)
    assert(x0.getSeq[Double](1) == Seq(98.0, 96.0, 94.0, 98.0))
  }
}
