package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ProjectionCatalog
import org.apache.spark.sql.graft.ProjectionCatalog.Measure
import org.apache.spark.sql.types.DecimalType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Gates for ClickHouse-style projections ([[org.apache.spark.sql.graft
  * .ProjectionRewrite]]):
  *
  *   1. FIRES on a matching aggregate (exact keys, subset-rollup keys,
  *      key-only filter, count(*)/count(m)/sum/min/max/avg, decimal-cast
  *      sums) and the served result equals the base plan's, row-for-row.
  *   2. Does NOT fire when it must not: unregistered table, non-key
  *      grouping column, filter on a non-key column, distinct aggregate,
  *      unsupported aggregate function, measure not in the projection —
  *      and the un-rewritten query still returns correct results.
  *   3. Preserves exprIds: operators ABOVE the rewritten aggregate
  *      (sort, filter-on-agg-result, projection) resolve untouched.
  *   4. Global aggregate over an empty filter result keeps COUNT()=0
  *      (the Coalesce-over-SUM edge).
  */
class ProjectionSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val scratch = Files.createTempDirectory("proj_spec").toString
  private val basePath = s"$scratch/base.parquet"
  private val projPath = s"$scratch/proj.parquet"

  override def beforeAll(): Unit = {
    super.beforeAll()
    // k1 in {a,b,c}, k2 in 0..3, v long, d double with .25 steps (exact)
    val df = spark.range(0, 4000).select(
      expr("CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END").as("k1"),
      (col("id") % 4).as("k2"),
      (col("id") % 97).as("v"),
      ((col("id") % 401).cast("double") / 4.0).as("d"),
      (col("id") % 11).as("extra"))
    df.write.mode("overwrite").parquet(basePath)
    ProjectionCatalog.define(spark, "spec_proj", basePath, projPath,
      keys = Seq("k1", "k2"),
      measures = Seq(Measure("v"), Measure("d", Some(DecimalType(18, 2)))))
  }

  override def afterAll(): Unit = {
    ProjectionCatalog.clear()
    super.afterAll()
  }

  private def base: DataFrame = spark.read.parquet(basePath)

  private def assertSame(df: DataFrame, expected: DataFrame): Unit = {
    val got = df.collect().map(_.toSeq)
    val want = expected.collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  /** The same logical query with the rule disabled (ground truth). */
  private def withRuleOff[T](f: => T): T = {
    spark.conf.set("spark.graft.projections.enabled", "false")
    try f finally spark.conf.set("spark.graft.projections.enabled", "true")
  }

  test("fires on exact-key aggregate; all agg kinds merge correctly") {
    def q = base.groupBy("k1", "k2").agg(
      sum($"v").as("sv"),
      count(lit(1)).as("n"),
      count($"v").as("nv"),
      min($"v").as("mn"),
      max($"v").as("mx"),
      avg($"v").as("av"),
      sum($"d".cast(DecimalType(18, 2))).cast("double").as("sd"))
      .orderBy("k1", "k2")
    val df = q
    assert(ProjectionCatalog.servedByProjection(df))
    assertSame(df, withRuleOff(q))
  }

  test("fires on a key-subset rollup with a key-only filter") {
    def q = base.filter($"k2" >= 1).groupBy("k1")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n")).orderBy("k1")
    val df = q
    assert(ProjectionCatalog.servedByProjection(df))
    assertSame(df, withRuleOff(q))
  }

  test("fires on a global aggregate (no grouping)") {
    def q = base.agg(sum($"v").as("sv"), count(lit(1)).as("n"))
    val df = q
    assert(ProjectionCatalog.servedByProjection(df))
    assertSame(df, withRuleOff(q))
  }

  test("empty filter result: count stays 0, sum stays null") {
    val df = base.filter($"k2" > 100).agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    assert(ProjectionCatalog.servedByProjection(df))
    val r = df.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("operators above the aggregate keep resolving (exprId stability)") {
    def q = base.groupBy("k1", "k2")
      .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
      .filter($"sv" > 100)
      .withColumn("ratio", $"sv".cast("double") / $"n")
      .orderBy(desc("sv"))
    val df = q
    assert(ProjectionCatalog.servedByProjection(df))
    assertSame(df, withRuleOff(q))
  }

  test("fires through the spark.sql text path (temp view alias)") {
    base.createOrReplaceTempView("proj_base_view")
    def q = spark.sql("""
      SELECT k1, sum(v) AS sv, count(*) AS n
      FROM proj_base_view WHERE k2 <= 2
      GROUP BY k1 ORDER BY k1""")
    val df = q
    assert(ProjectionCatalog.servedByProjection(df))
    assertSame(df, withRuleOff(q))
  }

  test("does not fire: non-key grouping column") {
    val df = base.groupBy("extra").agg(sum($"v").as("sv"))
    assert(!ProjectionCatalog.servedByProjection(df))
    assert(df.count() == 11)
  }

  test("does not fire: filter on a non-key column") {
    val df = base.filter($"extra" === 3).groupBy("k1").agg(sum($"v").as("sv"))
    assert(!ProjectionCatalog.servedByProjection(df))
  }

  test("does not fire: distinct aggregate / unsupported function / non-measure") {
    val d1 = base.groupBy("k1").agg(countDistinct($"v").as("u"))
    val d2 = base.groupBy("k1").agg(stddev($"v").as("s"))
    val d3 = base.groupBy("k1").agg(sum($"extra").as("se"))
    assert(!ProjectionCatalog.servedByProjection(d1))
    assert(!ProjectionCatalog.servedByProjection(d2))
    assert(!ProjectionCatalog.servedByProjection(d3))
    assert(d3.collect().map(_.getLong(1)).sum ==
      base.agg(sum($"extra")).collect()(0).getLong(0))
  }

  test("does not fire: unregistered table") {
    val other = s"$scratch/other.parquet"
    base.limit(100).write.mode("overwrite").parquet(other)
    val df = spark.read.parquet(other).groupBy("k1").agg(sum($"v").as("sv"))
    assert(!ProjectionCatalog.servedByProjection(df))
  }

  test("decimal-cast sum matches only the registered cast") {
    // d registered with DecimalType(18,2): a (28,6) cast must NOT be
    // served from the projection (different arithmetic), a (18,2) must.
    val hit = base.groupBy("k1").agg(sum($"d".cast(DecimalType(18, 2))).as("s"))
    val miss = base.groupBy("k1").agg(sum($"d".cast(DecimalType(28, 6))).as("s"))
    assert(ProjectionCatalog.servedByProjection(hit))
    assert(!ProjectionCatalog.servedByProjection(miss))
  }

  test("re-define in the same session rebuilds from the BASE, not itself") {
    // second define of the same projection: its build aggregate matches
    // the registered rewrite and, unguarded, would read the parquet it
    // overwrites. Must succeed and leave the rollup correct.
    ProjectionCatalog.define(spark, "spec_proj", basePath, projPath,
      keys = Seq("k1", "k2"),
      measures = Seq(Measure("v"), Measure("d", Some(DecimalType(18, 2)))))
    def q = base.groupBy("k1").agg(sum($"v").as("sv")).orderBy("k1")
    val df = q
    assert(ProjectionCatalog.servedByProjection(df))
    assertSame(df, withRuleOff(q))
  }

  test("selection prefers the smallest covering rollup") {
    val p2 = s"$scratch/proj_k1.parquet"
    ProjectionCatalog.define(spark, "spec_proj_k1", basePath, p2,
      keys = Seq("k1"), measures = Seq(Measure("v")))
    // k1-only grouping: both projections cover; the 1-key rollup wins
    val byK1 = base.groupBy("k1").agg(sum($"v").as("sv"))
    assert(ProjectionCatalog.servingProjection(byK1).contains("spec_proj_k1"))
    // (k1,k2) grouping: only the 2-key projection covers
    val byBoth = base.groupBy("k1", "k2").agg(sum($"v").as("sv"))
    assert(ProjectionCatalog.servingProjection(byBoth).contains("spec_proj"))
    ProjectionCatalog.invalidate(basePath)
    ProjectionCatalog.define(spark, "spec_proj", basePath, projPath,
      keys = Seq("k1", "k2"),
      measures = Seq(Measure("v"), Measure("d", Some(DecimalType(18, 2)))))
  }

  test("base mutation through Catalog invalidates the snapshot") {
    import graft.operators.Catalog
    val root = Files.createTempDirectory("proj_inval").toString
    val cat = Catalog(spark, root)
    cat.create("t", spark.range(0, 500).select(
      (col("id") % 3).cast("string").as("k"), (col("id") % 10).as("v")))
    val tPath = s"$root/t"
    ProjectionCatalog.define(spark, "inval_proj", tPath,
      s"$root/t_proj.parquet", keys = Seq("k"), measures = Seq(Measure("v")))
    val before = cat.readRaw("t").groupBy("k").agg(sum($"v").as("sv"))
    assert(ProjectionCatalog.servedByProjection(before))
    cat.append("t", spark.range(500, 600).select(
      (col("id") % 3).cast("string").as("k"), (col("id") % 10).as("v")))
    // stale snapshot must NOT serve — and the un-rewritten query is right
    val after = cat.readRaw("t").groupBy("k").agg(sum($"v").as("sv"))
    assert(!ProjectionCatalog.servedByProjection(after))
    assert(after.agg(sum($"sv")).collect()(0).getLong(0) ==
      (0L until 600L).map(_ % 10).sum)
    // re-define re-arms
    ProjectionCatalog.define(spark, "inval_proj", tPath,
      s"$root/t_proj.parquet", keys = Seq("k"), measures = Seq(Measure("v")))
    assert(ProjectionCatalog.servedByProjection(
      cat.readRaw("t").groupBy("k").agg(sum($"v").as("sv"))))
  }

  test("conf kill-switch disables the rewrite") {
    withRuleOff {
      val df = base.groupBy("k1", "k2").agg(sum($"v").as("sv"))
      assert(!ProjectionCatalog.servedByProjection(df))
    }
  }

  // NB Spark's NullPropagation usually folds count(NULL)→0 before our
  // rule runs (then serving keys from the rollup is legitimate); the
  // rewriteFn guard covers the paths where it doesn't. Either way the
  // value must be 0, never the row count.
  test("count(NULL) never yields the row count") {
    val df = base.groupBy("k1").agg(expr("count(NULL)").as("n"))
    assert(df.collect().forall(_.getLong(1) == 0L))
  }

  test("out-of-band base write drops the stale rollup (fingerprint)") {
    val root = Files.createTempDirectory("proj_oob").toString
    val bp = s"$root/base.parquet"
    def mk(n: Long) = spark.range(0, n).select(
      (col("id") % 3).cast("string").as("k"), (col("id") % 10).as("v"))
    mk(500).write.mode("overwrite").parquet(bp)
    ProjectionCatalog.define(spark, "oob_proj", bp,
      s"$root/proj.parquet", keys = Seq("k"), measures = Seq(Measure("v")))
    assert(ProjectionCatalog.servedByProjection(
      spark.read.parquet(bp).groupBy("k").agg(sum($"v").as("sv"))))
    // write AROUND the catalog — no invalidation hook fires
    mk(800).write.mode("overwrite").parquet(bp)
    val after = spark.read.parquet(bp).groupBy("k").agg(sum($"v").as("sv"))
    assert(!ProjectionCatalog.servedByProjection(after))
    assert(after.agg(sum($"sv")).collect()(0).getLong(0) ==
      (0L until 800L).map(_ % 10).sum)
  }
}
