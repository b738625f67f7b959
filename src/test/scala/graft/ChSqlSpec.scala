package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ChSql

/** Gates for the ClickHouse clause-dialect rewriter: every rewrite is
  * checked END-TO-END (the rewritten text must parse AND return the
  * right rows), string literals are inviolable, and everything out of
  * scope fails loudly instead of mis-rewriting.
  */
class ChSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val t = {
    val df = Seq(
      (1L, "a", 10.0, 100L), (2L, "a", 20.0, 200L), (3L, "a", 30.0, 300L),
      (4L, "b", 40.0, 400L), (5L, "b", 50.0, 500L), (6L, "c", 60.0, 600L))
      .toDF("id", "grp", "v", "w")
    df.createOrReplaceTempView("chsql_t")
    df
  }

  test("PREWHERE alone becomes WHERE") {
    t
    val r = ChSql.sql(spark, "SELECT id FROM chsql_t PREWHERE v > 25 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(3L, 4L, 5L, 6L))
  }

  test("PREWHERE + WHERE conjoin") {
    t
    val r = ChSql.sql(spark,
      "SELECT id FROM chsql_t PREWHERE v > 25 WHERE grp = 'b' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(4L, 5L))
  }

  test("PREWHERE inside a subquery is handled at its own depth") {
    t
    val r = ChSql.sql(spark,
      "SELECT count(*) AS c FROM (SELECT id FROM chsql_t PREWHERE grp = 'a') x")
      .collect()(0).getLong(0)
    assert(r == 3L)
  }

  test("LIMIT n BY cols: first n per group in ORDER BY order") {
    t
    val r = ChSql.sql(spark,
      "SELECT grp, id FROM chsql_t ORDER BY grp, v DESC LIMIT 1 BY grp")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("a", 3L), ("b", 5L), ("c", 6L)))
  }

  test("LIMIT n BY with trailing plain LIMIT") {
    t
    val r = ChSql.sql(spark,
      "SELECT grp, id FROM chsql_t ORDER BY grp, id LIMIT 2 BY grp LIMIT 4")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("a", 1L), ("a", 2L), ("b", 4L), ("b", 5L)))
  }

  test("SAMPLE with a registered key is deterministic and merges with WHERE") {
    t
    ChSql.registerSampleKey("chsql_s", "id")
    spark.range(0, 1000).toDF("id").createOrReplaceTempView("chsql_s")
    val a = ChSql.sql(spark,
      "SELECT count(*) AS c FROM chsql_s SAMPLE 1/4").collect()(0).getLong(0)
    val b = ChSql.sql(spark,
      "SELECT count(*) AS c FROM chsql_s SAMPLE 1/4").collect()(0).getLong(0)
    assert(a == b && a > 150 && a < 350, s"sample count $a")
    // offsets partition: four offset slices cover everything exactly once
    val total = (0 until 4).map { o =>
      ChSql.sql(spark,
        s"SELECT count(*) AS c FROM chsql_s SAMPLE 1/4 OFFSET $o/4")
        .collect()(0).getLong(0)
    }.sum
    assert(total == 1000L)
    val filtered = ChSql.sql(spark,
      "SELECT count(*) AS c FROM chsql_s SAMPLE 1/4 WHERE id < 500")
      .collect()(0).getLong(0)
    assert(filtered < a)
  }

  test("FORMAT / SETTINGS / GLOBAL / == strip-and-translate") {
    t
    val rw = ChSql.rewriteWithFormat(
      "SELECT id FROM chsql_t WHERE grp == 'a' SETTINGS max_threads = 8 FORMAT JSONEachRow")
    assert(rw.format.isEmpty || rw.format.contains("JSONEachRow"))
    // FORMAT comes last in CH; SETTINGS then FORMAT both strip
    val r = ChSql.sql(spark,
      "SELECT id FROM chsql_t WHERE grp == 'a' ORDER BY id FORMAT JSONEachRow")
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 2L, 3L))
    val g = ChSql.sql(spark,
      "SELECT id FROM chsql_t WHERE id GLOBAL IN (SELECT id FROM chsql_t WHERE grp = 'b') ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(g == Seq(4L, 5L))
  }

  test("SETTINGS max_threads/max_memory_usage scope the session conf per statement") {
    t
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val beforeB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val r = ChSql.sql(spark, """SELECT grp, count(*) AS c FROM chsql_t
      GROUP BY grp ORDER BY grp
      SETTINGS max_threads = 7, max_memory_usage = 123456, optimize_read_in_order = 1""")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    // the conf was IN FORCE during the statement (read back inside the
    // scope, where the statement executed eagerly)...
    assert(ChSql.lastSettingsScope ==
      Map("spark.sql.shuffle.partitions" -> "7",
        "spark.sql.autoBroadcastJoinThreshold" -> "123456"))
    // ...and restored after
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == beforeB)
    // unmapped names are recorded, not silently vanished
    assert(ChSql.lastDroppedSettings == Seq("optimize_read_in_order" -> "1"))
    // results identical to the unscoped twin
    assert(r == ChSql.sql(spark,
      "SELECT grp, count(*) AS c FROM chsql_t GROUP BY grp ORDER BY grp")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq)
    // a column aliased `settings` still never truncates the query
    val alias = ChSql.sql(spark,
      "SELECT count(*) AS settings FROM chsql_t").collect()(0).getLong(0)
    assert(alias == 6L)
  }

  test("string literals are inviolable; loud failures for out-of-scope") {
    t
    // the words inside the literal must survive untouched
    val r = ChSql.sql(spark,
      "SELECT 'PREWHERE LIMIT 1 BY x FORMAT CSV' AS s FROM chsql_t WHERE id = 1")
      .collect()(0).getString(0)
    assert(r == "PREWHERE LIMIT 1 BY x FORMAT CSV")
    intercept[UnsupportedOperationException] {
      ChSql.rewrite("SELECT d, n FROM t ORDER BY d WITH FILL STEP 1")
    }
    intercept[IllegalArgumentException] {
      ChSql.rewrite("SELECT * FROM unregistered_table SAMPLE 1/10")
    }
    intercept[IllegalArgumentException] {
      ChSql.rewrite(
        "SELECT * FROM (SELECT grp, id FROM chsql_t LIMIT 1 BY grp) x")
    }
  }

  test("ARRAY JOIN: single array, LEFT keeps empty rows, multi-array zips") {
    t
    Seq((1L, Seq("x", "y"), Seq(10, 20)), (2L, Seq("z"), Seq(30)),
      (3L, Seq.empty[String], Seq.empty[Int]))
      .toDF("id", "tags", "ns").createOrReplaceTempView("chsql_aj")
    val r = ChSql.sql(spark,
      "SELECT id, tag FROM chsql_aj ARRAY JOIN tags AS tag ORDER BY id, tag")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(r == Seq((1L, "x"), (1L, "y"), (2L, "z")))
    // LEFT keeps the empty-array row (null element — documented vs CH default)
    val l = ChSql.sql(spark,
      "SELECT id, tag FROM chsql_aj LEFT ARRAY JOIN tags AS tag ORDER BY id, tag")
      .collect().map(x => (x.getLong(0), Option(x.getString(1)))).toSeq
    assert(l == Seq((1L, Some("x")), (1L, Some("y")), (2L, Some("z")),
      (3L, None)))
    // multi-array zip by position; expression items (incl. the word `array`)
    val z = ChSql.sql(spark,
      "SELECT id, tag, n FROM chsql_aj ARRAY JOIN tags AS tag, ns AS n " +
        "WHERE id == 1 ORDER BY tag")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getInt(2))).toSeq
    assert(z == Seq((1L, "x", 10), (1L, "y", 20)))
    val e = ChSql.sql(spark,
      "SELECT v FROM chsql_aj ARRAY JOIN array(id * 2, id * 3) AS v " +
        "WHERE id = 2 ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(e == Seq(4L, 6L))
    // clause composes with the other passes downstream (PREWHERE, LIMIT BY)
    val c = ChSql.sql(spark,
      "SELECT id, tag FROM chsql_aj ARRAY JOIN tags AS tag PREWHERE id < 3 " +
        "ORDER BY id, tag LIMIT 1 BY id")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(c == Seq((1L, "x"), (2L, "z")))
    // expression without alias → loud (only a bare column may shadow)
    intercept[IllegalArgumentException] {
      ChSql.rewrite("SELECT v FROM chsql_aj ARRAY JOIN arrayConcat(tags, tags)")
    }
  }

  test("alias-less ARRAY JOIN: the element shadows the source column") {
    t
    Seq((1L, Seq("x", "y"), Seq(10, 20)), (2L, Seq("z"), Seq(30)),
      (3L, Seq.empty[String], Seq.empty[Int]))
      .toDF("id", "tags", "ns").createOrReplaceTempView("chsql_aj")
    // the CH shadow form: `tags` below means the ELEMENT everywhere —
    // select list, WHERE, ORDER BY
    val r = ChSql.sql(spark,
      "SELECT id, tags FROM chsql_aj ARRAY JOIN tags ORDER BY id, tags")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(r == Seq((1L, "x"), (1L, "y"), (2L, "z")))
    // WHERE sees the element, not the array
    val w = ChSql.sql(spark,
      "SELECT id, ns FROM chsql_aj ARRAY JOIN ns WHERE ns > 15 ORDER BY ns")
      .collect().map(x => (x.getLong(0), x.getInt(1))).toSeq
    assert(w == Seq((1L, 20), (2L, 30)))
    // multi-array zip with both shadowed; GROUP BY sees elements
    val z = ChSql.sql(spark,
      "SELECT tags, CAST(sum(ns) AS BIGINT) AS s FROM chsql_aj " +
        "ARRAY JOIN tags, ns GROUP BY tags ORDER BY tags")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(z == Seq(("x", 10L), ("y", 20L), ("z", 30L)))
    // mixed aliased + shadowed items in one clause
    val m = ChSql.sql(spark,
      "SELECT id, t, ns FROM chsql_aj ARRAY JOIN tags AS t, ns " +
        "WHERE id == 1 ORDER BY t")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getInt(2))).toSeq
    assert(m == Seq((1L, "x", 10), (1L, "y", 20)))
    // SELECT * never leaks internal pos/shadow columns
    val cols = ChSql.sql(spark,
      "SELECT * FROM chsql_aj ARRAY JOIN tags, ns WHERE id == 2").columns.toSeq
    assert(cols.sorted == Seq("id", "ns", "tags"))
    // LEFT shadow form keeps the empty-array row
    val l = ChSql.sql(spark,
      "SELECT id, tags FROM chsql_aj LEFT ARRAY JOIN tags ORDER BY id, tags")
      .collect().map(x => (x.getLong(0), Option(x.getString(1)))).toSeq
    assert(l.last == ((3L, None)))
    // composes with the downstream passes (PREWHERE merge, LIMIT BY)
    val c = ChSql.sql(spark,
      "SELECT id, tags FROM chsql_aj ARRAY JOIN tags PREWHERE id < 3 " +
        "ORDER BY id, tags LIMIT 1 BY id")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(c == Seq((1L, "x"), (2L, "z")))
    // still loud where shadowing is genuinely ambiguous: subquery depth
    intercept[IllegalArgumentException] {
      ChSql.rewrite("SELECT * FROM (SELECT tags FROM chsql_aj ARRAY JOIN tags) q")
    }
  }

  test("false-positive guards: CTE named fill, column named sample") {
    t
    val cte = ChSql.sql(spark,
      "WITH fill AS (SELECT id FROM chsql_t WHERE id < 3) " +
        "SELECT count(*) AS c FROM fill").collect()(0).getLong(0)
    assert(cte == 2L)
    Seq((1L, 7.0)).toDF("id", "sample").createOrReplaceTempView("chsql_sc")
    val sc = ChSql.sql(spark,
      "SELECT sample FROM chsql_sc WHERE id == 1").collect()(0).getDouble(0)
    assert(sc == 7.0)
  }

  test("FROM ... FINAL strips in table position only") {
    t
    val r = ChSql.sql(spark,
      "SELECT count(*) AS c FROM chsql_t FINAL WHERE id > 2").collect()(0).getLong(0)
    assert(r == 4L)
    // with an AS alias before the modifier
    val r2 = ChSql.sql(spark,
      "SELECT x.id FROM chsql_t AS x FINAL ORDER BY x.id LIMIT 1").collect()(0).getLong(0)
    assert(r2 == 1L)
    // a column named final is untouched (not in table position)
    Seq((1L, 9L)).toDF("id", "final").createOrReplaceTempView("chsql_f")
    val c = ChSql.sql(spark,
      "SELECT final FROM chsql_f WHERE id == 1").collect()(0).getLong(0)
    assert(c == 9L)
    // dotted table ref + FINAL inside a subquery depth
    val sub = ChSql.sql(spark,
      "SELECT count(*) AS n FROM (SELECT id FROM chsql_t FINAL) q").collect()(0).getLong(0)
    assert(sub == 6L)
  }

  test("WITH TOTALS: grouping-sets rewrite, guards, CTE false-positive") {
    t
    // per-group rows plus one NULL-keyed grand-total row
    val r = ChSql.sql(spark,
      "SELECT grp, count(*) AS c, CAST(sum(w) AS BIGINT) AS sw FROM chsql_t " +
        "GROUP BY grp WITH TOTALS ORDER BY grp NULLS FIRST")
      .collect().map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      (None, 6L, 2100L), (Some("a"), 3L, 600L), (Some("b"), 2L, 900L),
      (Some("c"), 1L, 600L)))
    // inside a subquery (depth > 0) rewrites at its own depth
    val sub = ChSql.sql(spark,
      "SELECT count(*) AS n FROM (SELECT grp, sum(w) AS sw FROM chsql_t " +
        "GROUP BY grp WITH TOTALS) x").collect()(0).getLong(0)
    assert(sub == 4L)
    // a CTE named totals is NOT the clause
    val cte = ChSql.sql(spark,
      "WITH totals AS (SELECT id FROM chsql_t WHERE id > 4) " +
        "SELECT count(*) AS c FROM totals").collect()(0).getLong(0)
    assert(cte == 2L)
    // HAVING alongside WITH TOTALS depends on CH totals_mode: loud
    val e = intercept[IllegalArgumentException] {
      ChSql.rewrite("SELECT grp FROM chsql_t GROUP BY grp WITH TOTALS HAVING count(*) > 1")
    }
    assert(e.getMessage.contains("totals_mode"))
    // TOTALS without GROUP BY: loud
    intercept[IllegalArgumentException] {
      ChSql.rewrite("SELECT 1 WITH TOTALS")
    }
    // WITH ROLLUP passes through untouched (Spark-native postfix)
    assert(ChSql.rewrite("SELECT grp, count(*) FROM chsql_t GROUP BY grp WITH ROLLUP")
      .contains("WITH ROLLUP"))
  }

  test("WITH FILL text form: FROM/TO/STEP/INTERPOLATE through the executing entry") {
    t
    Seq((2L, 10L, "a"), (6L, 30L, "b"), (7L, 70L, "x"))
      .toDF("axis", "v", "s").createOrReplaceTempView("chsql_fill")
    // grid 0,2,4,6,8 (TO 10 exclusive) + off-grid row 7 kept interleaved;
    // v gap-fills to 0 (type default), s carries forward (INTERPOLATE)
    val r = ChSql.sql(spark,
      "SELECT axis, v, s FROM chsql_fill ORDER BY axis " +
        "WITH FILL FROM 0 TO 10 STEP 2 INTERPOLATE (s)")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq
    assert(r == Seq((0L, 0L, null), (2L, 10L, "a"), (4L, 0L, "a"),
      (6L, 30L, "b"), (7L, 70L, "x"), (8L, 0L, "x")))
    // no FROM/TO: data min..max inclusive; trailing LIMIT applies after
    val r2 = ChSql.sql(spark,
      "SELECT axis, v FROM chsql_fill ORDER BY axis WITH FILL LIMIT 4")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r2 == Seq((2L, 10L), (3L, 0L), (4L, 0L), (5L, 0L)))
    // text-only rewrite keeps rejecting (spine needs a plan)
    intercept[UnsupportedOperationException] {
      ChSql.rewrite("SELECT axis FROM chsql_fill ORDER BY axis WITH FILL")
    }
    // loud contracts: multi-key axis, DESC, compounding INTERPOLATE
    intercept[IllegalArgumentException] {
      ChSql.sql(spark, "SELECT axis, v FROM chsql_fill ORDER BY axis, v WITH FILL")
    }
    intercept[IllegalArgumentException] {
      ChSql.sql(spark, "SELECT axis FROM chsql_fill ORDER BY axis DESC WITH FILL")
    }
    intercept[IllegalArgumentException] {
      ChSql.sql(spark,
        "SELECT axis, v FROM chsql_fill ORDER BY axis WITH FILL INTERPOLATE (v AS v + 1)")
    }
  }

  test("ChDialectParser: statement entry points rewrite, identifiers pass through") {
    // spark.sql.extensions is a STATIC conf (fixed at SparkContext
    // creation), so the injected path can't be exercised on the shared
    // test context; the parser CLASS is the unit under test — wiring is
    // the same one-line injectParser as the injectFunction calls the
    // whole suite already exercises.
    t
    val delegate = spark.sessionState.sqlParser
    val p = new graft.plans.ChDialectParser(delegate)
    val plan = p.parsePlan(
      "SELECT grp, id FROM chsql_t PREWHERE id > 1 ORDER BY grp, id LIMIT 1 BY grp")
    assert(plan.toString.contains("__gb_rn")) // the LIMIT BY window fired
    // a plan Spark's own parser rejects, accepted through the dialect
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      delegate.parsePlan("SELECT id FROM chsql_t PREWHERE id > 1")
    }
    assert(p.parsePlan("SELECT id FROM chsql_t PREWHERE id > 1") != null)
    // non-statement entry points delegate untouched
    assert(p.parseTableIdentifier("db.tbl").table == "tbl")
    assert(p.parseDataType("array<int>").simpleString == "array<int>")
  }
}
