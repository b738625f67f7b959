package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DictCatalog
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Catalog, SelectDialect}

/** Edge semantics for the round-9 engine-surface batch (q170–q174):
  * dictionaries' miss contract, arrayJoin's empty/null behavior,
  * WITH TOTALS's single-pass shape + empty input, SAMPLE's determinism
  * and offset wrap, and UPDATE's old-row assignment semantics.
  */
class EngineDialectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dimDf = Seq(
    (1L, "alpha", 10L),
    (2L, "beta", 20L),
    (3L, null.asInstanceOf[String], 30L)).toDF("k", "name", "w")

  test("dictGet miss contract: type default / null / explicit default / has") {
    DictCatalog.register(spark, "spec_dim", dimDf, "k")
    val df = Seq(1L, 2L, 99L).toDF("k").select(
      expr("dictGet('spec_dim', 'name', k)").as("d"),
      expr("dictGetOrNull('spec_dim', 'name', k)").as("n"),
      expr("dictGetOrDefault('spec_dim', 'name', k, 'missing')").as("dd"),
      expr("dictGet('spec_dim', 'w', k)").as("w"),
      expr("dictHas('spec_dim', k)").as("h"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "alpha" && rows(0).getBoolean(4))
    // miss: '' for string (CH type default), NULL for OrNull, explicit for OrDefault, 0 for long
    assert(rows(2).getString(0) == "" && rows(2).isNullAt(1))
    assert(rows(2).getString(2) == "missing" && rows(2).getLong(3) == 0L)
    assert(!rows(2).getBoolean(4))
  }

  test("dictGet: NULL stored attribute falls back like a miss") {
    DictCatalog.register(spark, "spec_dim", dimDf, "k")
    val r = Seq(3L).toDF("k").select(
      expr("dictGet('spec_dim', 'name', k)").as("d"),
      expr("dictGetOrNull('spec_dim', 'name', k)").as("n"),
      expr("dictHas('spec_dim', k)").as("h")).collect()(0)
    assert(r.getString(0) == "" && r.isNullAt(1) && r.getBoolean(2))
  }

  test("dictGet: probe key is coerced to the dictionary key type") {
    DictCatalog.register(spark, "spec_dim", dimDf, "k")
    // INT literal / INT column probing a BIGINT-keyed dict must match,
    // not silently miss on boxed-type inequality (r9 ADVICE)
    val r = Seq(1, 2, 9).toDF("ik").select(
      expr("dictGet('spec_dim', 'name', 1)").as("lit"),
      expr("dictGet('spec_dim', 'name', ik)").as("c"),
      expr("dictHas('spec_dim', ik)").as("h")).collect()
    assert(r(0).getString(0) == "alpha")
    assert(r.map(_.getString(1)).toSeq == Seq("alpha", "beta", ""))
    assert(r.map(_.getBoolean(2)).toSeq == Seq(true, true, false))
    // incompatible probe type fails loudly at bind time
    val e = intercept[Exception] {
      Seq(Array(1.0)).toDF("a")
        .select(expr("dictGet('spec_dim', 'name', a)")).collect()
    }
    assert(e.getMessage.contains("key type"))
  }

  test("dict register: row cap is loud, not an OOM") {
    spark.conf.set("spark.graft.dict.maxRows", "2")
    try {
      val e = intercept[IllegalArgumentException] {
        DictCatalog.register(spark, "too_big", dimDf, "k")
      }
      assert(e.getMessage.contains("maxRows"))
    } finally spark.conf.unset("spark.graft.dict.maxRows")
    DictCatalog.register(spark, "fits", dimDf, "k") // default cap: fine
  }

  test("dictGet: unknown dict and unknown attr are loud analysis errors") {
    DictCatalog.register(spark, "spec_dim", dimDf, "k")
    val e1 = intercept[Exception] {
      Seq(1L).toDF("k").select(expr("dictGet('nope', 'name', k)")).collect()
    }
    assert(e1.getMessage.contains("unknown dictionary"))
    val e2 = intercept[Exception] {
      Seq(1L).toDF("k").select(expr("dictGet('spec_dim', 'nope', k)")).collect()
    }
    assert(e2.getMessage.contains("no attribute"))
  }

  test("dictGetHierarchy / dictIsIn: chain walk, 0-terminator, cycle guard") {
    // region tree: 1 <- 2 <- 4; 3 is a root; 5/6 form a CYCLE
    val tree = Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 2L),
      (5L, 6L), (6L, 5L)).toDF("k", "parent")
    DictCatalog.register(spark, "spec_tree", tree, "k")
    def chain(k: Long): Seq[Long] =
      spark.sql(s"SELECT dictGetHierarchy('spec_tree', 'parent', ${k}L) AS h")
        .collect()(0).getSeq[Long](0).toSeq
    assert(chain(4L) == Seq(4L, 2L, 1L))
    assert(chain(1L) == Seq(1L))
    assert(chain(99L) == Seq()) // miss -> empty chain
    assert(chain(5L) == Seq(5L, 6L)) // cycle terminates, never spins
    def isIn(c: Long, a: Long): Boolean =
      spark.sql(s"SELECT dictIsIn('spec_tree', 'parent', ${c}L, ${a}L) AS b")
        .collect()(0).getBoolean(0)
    assert(isIn(4L, 1L) && isIn(4L, 4L) && !isIn(4L, 3L) && !isIn(1L, 4L))
  }

  test("arrayJoin skips empty and null arrays (CH contract)") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])).toDF("id", "arr")
    df.createOrReplaceTempView("aj_in")
    val out = spark.sql("SELECT id, arrayJoin(arr) AS w FROM aj_in")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (1L, "b")))
  }

  test("withTotals: one pass (single Expand), totals row, empty input") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 10L)).toDF("k", "v")
    val t = SelectDialect.withTotals(df, Seq(col("k")),
      Seq(sum($"v").as("s"), count(lit(1)).as("n")))
      .orderBy(asc_nulls_first("k"))
    val rows = t.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((null, 13L, 3L), ("x", 3L, 2L), ("y", 10L, 1L)))
    // single-pass: exactly one Expand, one scan in the optimized plan
    val plan = t.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Expand, LocalRelation}
    assert(plan.collect { case e: Expand => e }.size == 1)
    assert(plan.collectLeaves().size == 1)
    // empty input: Spark's Expand+Aggregate grouping-sets plan produces
    // NO rows (unlike a bare global aggregate) — pinned as the operator
    // contract (see withTotals scaladoc)
    val empty = SelectDialect.withTotals(df.filter($"v" > 100), Seq(col("k")),
      Seq(count(lit(1)).as("n"))).collect()
    assert(empty.isEmpty)
  }

  test("sampleByKey: deterministic, key-consistent, offset wraps, covers all") {
    val df = spark.range(0, 10000).toDF("k")
    val s1 = SelectDialect.sampleByKey(df, $"k", 3, 10).collect().map(_.getLong(0)).toSet
    val s2 = SelectDialect.sampleByKey(df.repartition(13), $"k", 3, 10)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // pure function of the key, not of partitioning
    assert(s1.size > 2000 && s1.size < 4000) // ~30%
    // offset slices are disjoint and the den/den union is everything
    val slices = (0 until 10).map(o =>
      SelectDialect.sampleByKey(df, $"k", 1, 10, offset = o)
        .collect().map(_.getLong(0)).toSet)
    assert(slices.map(_.size).sum == 10000)
    assert(slices.reduce(_ ++ _).size == 10000)
    // wrap-around: offset 8 + num 3 wraps past den
    val wrap = SelectDialect.sampleByKey(df, $"k", 3, 10, offset = 8)
      .collect().map(_.getLong(0)).toSet
    assert(wrap == (slices(8) ++ slices(9) ++ slices(0)))
  }

  test("anyLeftJoin: one right row per left, unmatched stay null") {
    val left = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "lv")
    val right = Seq((1L, "b", 20), (1L, "a", 10), (2L, "c", 30))
      .toDF("k", "rv", "ord")
    val out = SelectDialect.anyLeftJoin(left, right, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(out == Seq((1L, "x", "a"), (2L, "y", "c"), (3L, "z", null)))
  }

  test("applyTtl drops exactly the expired rows") {
    val root = Files.createTempDirectory("ttl_spec").toString
    val cat = Catalog(spark, root)
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    cat.create("t", Seq((1L, ts(1)), (2L, ts(10)), (3L, ts(20)), (4L, ts(25)))
      .toDF("id", "ts"))
    cat.applyTtl("t", "ts", expr("INTERVAL 10 DAYS"), lit(ts(25)))
    val kept = cat.readRaw("t").select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L)) // day 20 and 25 survive a 10-day TTL at day 25
  }

  test("hasToken: whole-token boundaries; regex metachars are literal") {
    val df = Seq("big data lake", "database", "data", "a (data) b", "c+d e")
      .toDF("t")
    val got = df.select(expr("hasToken(t, 'data')").as("a"),
      expr("hasToken(t, 'c+d')").as("b")).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(got == Seq((true, false), (false, false), (true, false),
      (true, false), (false, true)))
    val e = intercept[Exception] {
      df.select(expr("hasToken(t, t)")).collect()
    }
    assert(e.getMessage.contains("constant"))
  }

  test("tokens + multiSearchAllPositions") {
    val r = Seq("Hello, world! 42 foo").toDF("t").select(
      expr("tokens(t)").as("tk"),
      expr("multiSearchAllPositions(t, array('world', 'nope', 'Hello'))").as("p"))
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("Hello", "world", "42", "foo"))
    assert(r.getSeq[Int](1) == Seq(8, 0, 1))
  }

  test("system.parts listing: per-table files, compaction shrinks parts") {
    val root = Files.createTempDirectory("parts_spec").toString
    val cat = Catalog(spark, root)
    cat.create("t1", spark.range(0, 100).toDF("id").withColumn("v", lit(1L)))
    (1 to 3).foreach(i => cat.append("t1",
      spark.range(i * 100, i * 100 + 10).toDF("id").withColumn("v", lit(i.toLong))))
    val before = cat.parts().filter($"table" === "t1").collect()
    assert(before.length >= 4 && before.forall(_.getAs[Long]("bytes") > 0))
    cat.compact("t1", Seq("id"), "v")
    val after = cat.parts().filter($"table" === "t1").count()
    assert(after < before.length)
  }

  test("dropPartition removes exactly one partition, no scan of the rest") {
    val root = Files.createTempDirectory("droppart_spec").toString
    val cat = Catalog(spark, root)
    cat.create("t", spark.range(0, 300).select(
      (col("id") % 3).cast("string").as("day"), col("id").as("v")),
      partitionBy = Seq("day"))
    cat.dropPartition("t", "day", "1")
    // NB partition-dir values are type-INFERRED on read ("1" comes back
    // as int) — normalize through a cast
    val days = cat.readRaw("t").select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(days == Set("0", "2"))
    assert(cat.readRaw("t").count() == 200)
    cat.dropPartition("t", "day", "99") // absent partition: no-op
    assert(cat.readRaw("t").count() == 200)
  }

  test("mutations preserve partition layout; dropPartition stays loud") {
    val root = Files.createTempDirectory("mutpart_spec").toString
    val cat = Catalog(spark, root)
    cat.create("t", spark.range(0, 300).select(
      (col("id") % 3).cast("string").as("day"), col("id").as("v")),
      partitionBy = Seq("day"))
    // a rewrite mutation must NOT flatten the day=… directory layout —
    // retention by dropPartition would silently no-op after (r9 ADVICE)
    cat.updateWhere("t", col("v") < 10, Map("v" -> (col("v") + 1000)))
    cat.deleteWhere("t", col("v") === 1000L)
    cat.dropPartition("t", "day", "1")
    val days = cat.readRaw("t").select(col("day").cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(days == Set("0", "2"))
    assert(cat.readRaw("t").filter(col("v") === 1001L).count() == 0)
    // dropPartition on a table not partitioned by that column is loud
    cat.create("flat", spark.range(0, 10).toDF("v"))
    val e = intercept[IllegalArgumentException] {
      cat.dropPartition("flat", "day", "1")
    }
    assert(e.getMessage.contains("not partitioned"))
  }

  test("formatDateTime: translation, literals, %%, unsupported symbol is loud") {
    GraftSession.install(spark)
    val r = Seq("2024-03-05 07:08:09").toDF("s")
      .selectExpr("CAST(s AS TIMESTAMP) AS ts")
      .selectExpr("formatDateTime(ts, '%Y/%m/%d %H:%i:%S') AS a",
        "formatDateTime(ts, '%T on %F') AS b",
        "formatDateTime(ts, 'yr=%y 100%% day %j') AS c").collect()(0)
    assert(r.getString(0) == "2024/03/05 07:08:09")
    assert(r.getString(1) == "07:08:09 on 2024-03-05")
    assert(r.getString(2) == "yr=24 100% day 065")
    val e = intercept[Exception] {
      Seq(1).toDF("x").selectExpr("formatDateTime(current_timestamp(), '%Q')")
        .collect()
    }
    assert(e.getMessage.contains("unsupported symbol"))
  }

  test("updateWhere: every RHS sees the OLD row") {
    val root = Files.createTempDirectory("mut_spec").toString
    val cat = Catalog(spark, root)
    cat.create("t", Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0))
      .toDF("id", "a", "b"))
    // swap a and b where id=1: with old-row semantics both move; with
    // sequential semantics b would get the NEW a
    cat.updateWhere("t", col("id") === 1, Map(
      "a" -> col("b"),
      "b" -> col("a")))
    val rows = cat.readRaw("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, 100.0, 10.0), (2L, 20.0, 200.0)))
  }
}
