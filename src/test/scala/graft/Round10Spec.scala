package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hist
import graft.sources.CsvFormat

/** Round-10 surface: the deterministic histogram(N), the
  * moving-aggregate family, and the CSV format family.
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- histogram -----------------------------------------------------

  test("histogram: partitioning-independent (the property CH's own lacks)") {
    val base = spark.range(0, 5000)
      .select((col("id") % 997).cast("double").as("v"))
    val a = Hist.bins(base.repartition(1), "v", 12)
    val b = Hist.bins(base.repartition(17), "v", 12)
    val c = Hist.bins(base.orderBy(rand(42)).repartition(5), "v", 12)
    assert(a == b && b == c)
  }

  test("histogram invariants: N bins, contiguous, exact mass and bounds") {
    val df = spark.range(0, 3000)
      .select((pow(col("id").cast("double") / 3000.0, 3.0) * 100.0).as("v"))
    val bs = Hist.bins(df, "v", 10)
    assert(bs.length == 10)
    assert(bs.map(_.height).sum == 3000.0)
    val stats = df.agg(min("v"), max("v")).collect()(0)
    assert(bs.head.lower == stats.getDouble(0))
    assert(bs.last.upper == stats.getDouble(1))
    bs.sliding(2).foreach(p => assert(p(0).upper == p(1).lower))
    assert(bs.forall(b => b.upper > b.lower))
  }

  test("histogram adapts: dense region gets narrower bins") {
    // 90% of mass in [0,1], 10% spread over [0,100]
    val df = spark.range(0, 10000).select(
      when(col("id") % 10 =!= 0, (col("id") % 900).cast("double") / 900.0)
        .otherwise((col("id") % 100).cast("double")).as("v"))
    val bs = Hist.bins(df, "v", 8)
    val denseW = bs.head.upper - bs.head.lower
    val sparseW = bs.last.upper - bs.last.lower
    assert(denseW < sparseW / 5,
      s"expected dense-region bins far narrower: $denseW vs $sparseW")
  }

  test("histogram edges: empty, constant, fewer distinct than bins") {
    assert(Hist.bins(Seq.empty[Double].toDF("v"), "v", 5).isEmpty)
    val const = Hist.bins(Seq(7.0, 7.0, 7.0).toDF("v"), "v", 5)
    assert(const == Seq(Hist.Bin(7.0, 7.0, 3.0)))
    val few = Hist.bins(Seq(1.0, 2.0, 2.0, 9.0).toDF("v"), "v", 8)
    assert(few.length <= 8 && few.map(_.height).sum == 4.0)
  }

  // ---- moving aggregates --------------------------------------------

  test("groupArrayMovingSum/Avg: sorted order, window math, determinism") {
    GraftSession.install(spark)
    val df = Seq((1L, 10L, 1.0), (1L, 30L, 3.0), (1L, 20L, 2.0),
      (2L, 5L, 10.0)).toDF("g", "k", "v")
    def run(parts: Int) =
      df.repartition(parts).groupBy("g").agg(
        expr("groupArrayMovingSum(k, v, 2)").as("ms"),
        expr("groupArrayMovingAvg(k, v)").as("ma"))
        .orderBy("g").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2)))
        .toSeq
    val got = run(1)
    // g=1 sorted by k: v = 1,2,3 → win-2 sums 1,3,5; cumulative means 1,1.5,2
    assert(got == Seq(
      (1L, Seq(1.0, 3.0, 5.0), Seq(1.0, 1.5, 2.0)),
      (2L, Seq(10.0), Seq(10.0))))
    assert(run(7) == got) // partitioning-independent
  }

  test("moving aggs: null skip, loud non-literal window") {
    GraftSession.install(spark)
    val df = Seq((1L, java.lang.Double.valueOf(1.0)),
      (2L, null.asInstanceOf[java.lang.Double]),
      (3L, java.lang.Double.valueOf(3.0))).toDF("k", "v")
    val r = df.agg(expr("groupArrayMovingSum(k, v)")).collect()(0)
    assert(r.getSeq[Double](0) == Seq(1.0, 4.0))
    val e = intercept[Exception] {
      df.agg(expr("groupArrayMovingSum(k, v, k)")).collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("deltaSum: positive steps only, sorted contract, determinism") {
    GraftSession.install(spark)
    // sorted by k: values 10, 13, 9, 14 → deltas +3, -4, +5 → deltaSum 8
    val df = Seq((1L, 10.0), (4L, 14.0), (2L, 13.0), (3L, 9.0)).toDF("k", "v")
    def run(parts: Int) = df.repartition(parts)
      .agg(expr("deltaSum(k, v)")).collect()(0).getDouble(0)
    assert(run(1) == 8.0 && run(3) == 8.0)
  }

  test("aggregate aliases map onto Spark natives") {
    GraftSession.install(spark)
    val df = Seq(1L, 2L, 3L, 4L).toDF("x")
    val r = df.agg(
      expr("groupBitAnd(x)"), expr("groupBitOr(x)"), expr("groupBitXor(x)"),
      expr("varPop(x)"), expr("stddevSamp(x)"), expr("uniqCombined(x)"))
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 7L && r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(3) - 1.25) < 1e-12)
    assert(r.getLong(5) == 4L)
  }

  // ---- CSV format family --------------------------------------------

  test("CSV/TSVWithNames round-trip incl. nulls, quotes, tabs") {
    val scratch = Files.createTempDirectory("csv_spec").toString
    val df = Seq(
      (1L, "plain", java.lang.Double.valueOf(1.5)),
      (2L, "comma, quoted \"x\"", java.lang.Double.valueOf(-2.25)),
      (3L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]),
      (4L, "tab\there", java.lang.Double.valueOf(0.0)))
      .toDF("id", "s", "v")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    for (flavor <- Seq(CsvFormat.CsvWithNames, CsvFormat.TsvWithNames)) {
      val p = s"$scratch/${flavor.getClass.getSimpleName}"
      CsvFormat.write(df, p, flavor)
      val back = CsvFormat.read(spark, schema, p, flavor)
        .orderBy("id").collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
      assert(back == Seq((1L, "plain", 1.5),
        (2L, "comma, quoted \"x\"", -2.25), (3L, null, null),
        (4L, "tab\there", 0.0)), s"flavor $flavor")
    }
  }

  // ---- round-10 dialect batch edges (oracle gates: q189–q192) --------

  test("dialect edges: hash stability, miss defaults, loud non-literals") {
    GraftSession.install(spark)
    val df = Seq(("a", 1L), ("b", 2L)).toDF("s", "n")
    // sipHash64/cityHash64: stable across runs and partitionings
    val h1 = df.repartition(1).selectExpr("sipHash64(s, n) AS h")
      .collect().map(_.getLong(0)).toSeq
    val h2 = df.repartition(4).selectExpr("sipHash64(s, n) AS h")
      .collect().map(_.getLong(0)).toSeq
    assert(h1.sorted == h2.sorted && h1.distinct.length == 2)
    // JSON miss defaults: bool false, int null-through-cast, has false
    val r = Seq("""{"a":1}""").toDF("j").selectExpr(
      "JSONExtractBool(j, 'missing') AS b",
      "JSONHas(j, 'missing') AS h",
      "JSONLength(j) AS l").collect()(0)
    assert(!r.getBoolean(0) && !r.getBoolean(1) && r.getInt(2) == 1)
    // loud non-literal parameters
    val e1 = intercept[Exception] {
      df.selectExpr("toStartOfInterval(current_timestamp(), n)").collect()
    }
    assert(e1.getMessage.contains("literal"))
    val e2 = intercept[Exception] {
      df.selectExpr("extractURLParameter(s, s)").collect()
    }
    assert(e2.getMessage.contains("literal"))
    val e3 = intercept[Exception] {
      df.selectExpr("multiIf(n > 1, 'x')").collect()
    }
    assert(e3.getMessage.contains("arity") || e3.getMessage.contains("odd"))
    // intDiv floors toward negative infinity (CH), not toward zero
    val d = Seq((-7L, 2L)).toDF("a", "b")
      .selectExpr("intDiv(a, b)").collect()(0).getLong(0)
    assert(d == -4L)
  }

  test("headerless CSV reads with declared schema only") {
    val scratch = Files.createTempDirectory("csv_spec2").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    CsvFormat.write(df, s"$scratch/plain", CsvFormat.Csv)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    val back = CsvFormat.read(spark, schema, s"$scratch/plain", CsvFormat.Csv)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == Seq((1L, "a"), (2L, "b")))
  }
}
