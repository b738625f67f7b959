package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.ProjectionCatalog
import org.apache.spark.sql.graft.ProjectionCatalog.Measure
import org.apache.spark.sql.types.DecimalType

import graft.operators.MatView

/** Rollup scale soak (projections q168 + materialized view q169 at
  * 1000x the gate corpus): a 20M-row fact table on parquet, a
  * (k1, k2)-keyed projection, and the three numbers that justify the
  * feature at 100 TB:
  *
  *   1. direct aggregate over the fact parquet (rule disabled) vs the
  *      SAME query served from the projection — the read-side win is
  *      |rollup| / |fact| and should be order(s) of magnitude;
  *   2. matview incremental insert of a 200k batch vs recomputing the
  *      full aggregate — the write-side win: maintenance cost scales
  *      with the BATCH, not the base;
  *   3. projection build cost (one shuffle over the base) — the one-time
  *      price, amortized over every later query.
  *
  * Corpus derives from xxhash64(id) map-only (partitioning-independent,
  * same recipe as FunnelSoak). Results recorded in PLANS.md
  * ("Projections & matview at 20M rows"). Not driver-run.
  */
object RollupSoak {
  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("SOAK_ROWS", "20000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)

    val root = graft.operators.AnnIndex.tmpRoot + "/rollup_soak"
    val factPath = s"$root/fact.parquet"
    val projPath = s"$root/proj.parquet"
    val mvPath = s"$root/mv.parquet"

    // 16 x 128 = 2048 groups; v integral double (exact sums), d 2-decimal
    def rowsDf(n: Long, off: Long = 0) = spark.range(off, off + n).select(
      concat(lit("g"), pmod(xxhash64(col("id"), lit(1)), lit(16))).as("k1"),
      pmod(xxhash64(col("id"), lit(2)), lit(128)).as("k2"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000)).cast("double").as("v"),
      (pmod(xxhash64(col("id"), lit(4)), lit(100000)) / 100.0).as("d"))

    println(s"rows=$nRows  groups=2048")
    time("fact write (setup, uncounted)") {
      rowsDf(nRows).write.mode("overwrite").parquet(factPath)
    }

    val measures = Seq(Measure("v"), Measure("d", Some(DecimalType(18, 2))))

    time("projection build (one-time)") {
      ProjectionCatalog.define(spark, "soak_proj", factPath, projPath,
        keys = Seq("k1", "k2"), measures = measures)
    }

    def query() = spark.read.parquet(factPath)
      .filter(col("k2") < 96)
      .groupBy("k1")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        sum(col("d").cast(DecimalType(18, 2))).cast("double").as("sd"))

    spark.conf.set("spark.graft.projections.enabled", "false")
    val direct = bench(s"direct aggregate (${nRows / 1000000}M scan)") {
      query().collect()
    }
    spark.conf.set("spark.graft.projections.enabled", "true")
    val served = bench("projection-served (2048-row scan)") {
      val df = query()
      val out = df.collect()
      require(ProjectionCatalog.servedByProjection(df), "rewrite must fire")
      out
    }
    val dRows = direct.map(_.toSeq.toList).sortBy(_.toString())
    val sRows = served.map(_.toSeq.toList).sortBy(_.toString())
    if (dRows.toSeq != sRows.toSeq) {
      dRows.zip(sRows).filter { case (a, b) => a != b }.take(5).foreach {
        case (a, b) => println(s"DIRECT $a\nSERVED $b")
      }
      require(false, "projection ≠ direct")
    }

    // --- matview: maintenance cost scales with the batch ---------------
    time("matview backfill (one-time)") {
      MatView.create(spark, mvPath, Seq("k1", "k2"), measures,
        initial = spark.read.parquet(factPath))
    }
    val mv = MatView(spark, mvPath, Seq("k1", "k2"), measures)
    val batch = rowsDf(200000, off = nRows).cache()
    batch.count()
    bench("matview insert (200k batch)") { mv.insert(batch); 1 }
    bench("matview merge-on-read finalize") { mv.read().collect() }
    spark.conf.set("spark.graft.projections.enabled", "false")
    bench("full recompute (the displaced cost)") {
      spark.read.parquet(factPath).groupBy("k1", "k2")
        .agg(sum(col("v")), count(lit(1))).collect()
    }
    println(s"matview partial rows after 1 insert: ${mv.partialCount()}")

    // --- matview compact under the pointer flip (r16) -------------------
    // OPTIMIZE FINAL now commits write-beside + flip (EpochStore): the
    // wall is the 2048-row merged write; the flip itself is one ~40-byte
    // pointer write + a bounded sweep, measured separately below.
    val before = mv.read().collect().map(_.toSeq.toList).sortBy(_.toString())
    time("matview compact (flip-committed)") { mv.compact() }
    val after = mv.read().collect().map(_.toSeq.toList).sortBy(_.toString())
    require(before.toSeq == after.toSeq, "compact changed the view")
    println(s"matview partial rows after compact: ${mv.partialCount()}")
    // flip overhead in isolation: N trivial commits on a tiny store
    import spark.implicits._
    val flipRoot = s"$root/flip_probe"
    val fsOps = graft.operators.FsOps(spark)
    val one = Seq(1).toDF("x")
    one.count() // plan warm
    val t0 = System.nanoTime()
    val n = 20
    (1 to n).foreach { _ =>
      graft.operators.EpochStore.commit(fsOps, flipRoot)(d =>
        one.write.parquet(d))
    }
    println(f"epoch commit+sweep, tiny store: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/commit (incl. the 1-row parquet write)")
    spark.conf.set("spark.graft.projections.enabled", "true")
    spark.stop()
  }

  private def time[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"$name%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  private def bench[T](name: String)(body: => T): T = {
    body // warm
    var best = Double.MaxValue
    var out: T = null.asInstanceOf[T]
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      out = body
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"$name%-38s $best%7.3f s (best of 3)")
    out
  }
}
