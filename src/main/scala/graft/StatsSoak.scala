package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the round-10 statistics families. Three phases, each
  * against the plan a SQL user would write instead:
  *
  *  1. cramersV/theilsU (PairStatsAgg) at 20M rows vs the pair-count
  *     CTE pile the oracle uses: the aggregate is ONE user-key-free
  *     shuffle whose state is O(distinct pairs) per group — the CTE twin
  *     shuffles the pair counts three more times for marginals/joins.
  *  2. sumForEach/avgForEach (ForEachAgg) over 2M 64-dim arrays vs the
  *     posexplode → groupBy closed form: position-wise state is one
  *     (vals, cnts) pair per group vs a 128M-row exploded shuffle.
  *  3. KS/MWU/rankCorr (RankStatsAgg) at 20M rows over 2,000 bounded
  *     groups (~10k rows each): state is O(rows-per-group) BY CONTRACT
  *     (the sorted-rank pass needs the group's pairs) — the measured
  *     number is shuffle bytes per input row, which must stay flat as
  *     total rows scale with fixed group cardinality. A single-group KS
  *     over 100 TB is out of contract, same as groupArray.
  *
  * Corpus derives every field from xxhash64(id, salt) — map-only,
  * partitioning-independent, re-runnable. Results committed in PLANS.md
  * ("Statistics families at 20M rows"). Not driver-run.
  */
object StatsSoak {
  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("SOAK_ROWS", "20000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    def phase(name: String, rows: Long = nRows)(body: => Long): Unit = {
      val sb0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val out = body
      val secs = (System.nanoTime() - t0) / 1e9
      val sb = shuffleBytes.get() - sb0
      println(f"[soak] $name%-28s ${secs}%8.2f s  ${rows / secs / 1e6}%7.1f Mrow/s  " +
        f"shuffle ${sb / 1e6}%9.1f MB (${sb.toDouble / rows}%5.2f B/row)  out=$out")
    }

    spark.range(nRows)
      .select(
        (xxhash64(col("id"), lit(1)) % 16).cast("int").as("g"),
        pmod(xxhash64(col("id"), lit(2)), lit(40)).cast("string").as("x"),
        pmod(xxhash64(col("id"), lit(3)), lit(12)).cast("string").as("y"),
        (pmod(xxhash64(col("id"), lit(4)), lit(100000)) / 100.0).as("v"),
        pmod(xxhash64(col("id"), lit(5)), lit(2)).cast("int").as("s"),
        pmod(xxhash64(col("id"), lit(6)), lit(2000)).as("u"),
        col("id").as("k"))
      .write.mode("overwrite").parquet(graft.operators.AnnIndex.tmpRoot + "/stats_soak_t")
    // parquet-materialized, NOT .cache(): Spark 4.1.2's InMemoryRelation
    // .withOutput throws "key not found" when a cached relation is
    // referenced several times with pruned outputs (stock bug, reproduced
    // without graft extensions installed)
    spark.read.parquet(graft.operators.AnnIndex.tmpRoot + "/stats_soak_t")
      .createOrReplaceTempView("t")

    // -- phase 1: categorical association, aggregate vs CTE twin --------
    phase("cramersV+theilsU agg") {
      spark.sql("""
        SELECT g, cramersV(x, y) AS cv, theilsU(x, y) AS tu
        FROM t GROUP BY g""").count()
    }
    phase("cramersV SQL twin") {
      spark.sql("""
        WITH pc AS (SELECT g, x, y, count(*) AS c FROM t GROUP BY 1,2,3),
        rm AS (SELECT g, x, sum(c) AS rc FROM pc GROUP BY 1,2),
        cm AS (SELECT g, y, sum(c) AS cc FROM pc GROUP BY 1,2),
        nn AS (SELECT rm.g, sum(rc) AS n, count(*) AS r FROM rm GROUP BY 1),
        cd AS (SELECT cm.g, count(*) AS cd FROM cm GROUP BY 1)
        SELECT pc.g,
               sqrt(max(nn.n) * (sum(CAST(pc.c AS DOUBLE) * pc.c
                 / (rm.rc * CAST(cm.cc AS DOUBLE))) - 1.0)
                 / max(nn.n) / (least(max(nn.r), max(cd.cd)) - 1)) AS cv
        FROM pc JOIN rm ON pc.g = rm.g AND pc.x = rm.x
                JOIN cm ON pc.g = cm.g AND pc.y = cm.y
                JOIN nn ON pc.g = nn.g
                JOIN cd ON pc.g = cd.g
        GROUP BY pc.g""").count()
    }

    // -- phase 2: ForEach over arrays vs posexplode twin -----------------
    val nArr = math.max(1L, nRows / 10)
    spark.range(nArr)
      .select((col("id") % 16).as("g"),
        expr("transform(sequence(0, 63), i -> CAST(pmod(xxhash64(id, i), 1000) AS DOUBLE) / 10)").as("arr"))
      .write.mode("overwrite").parquet(graft.operators.AnnIndex.tmpRoot + "/stats_soak_arrs")
    spark.read.parquet(graft.operators.AnnIndex.tmpRoot + "/stats_soak_arrs")
      .createOrReplaceTempView("arrs")
    phase(s"sumForEach ${nArr / 1000000}M x64", nArr) {
      spark.sql("SELECT g, sumForEach(arr) AS s, avgForEach(arr) AS a FROM arrs GROUP BY g").count()
    }
    phase("explode twin", nArr) {
      spark.sql("""
        SELECT g, pos, sum(e) AS s, avg(e) AS a
        FROM arrs LATERAL VIEW posexplode(arr) AS pos, e
        GROUP BY g, pos""").count()
    }

    // -- phase 3: rank statistics over bounded groups --------------------
    phase("KS+MWU+rankCorr 2k groups") {
      spark.sql("""
        SELECT u, kolmogorovSmirnovTest(v, s).d_statistic AS d,
               mannWhitneyUTest(v, s).u_statistic AS mu,
               rankCorr(v, k % 1000) AS rho
        FROM t GROUP BY u""").count()
    }
    phase("intervalLengthSum 16 grp") {
      spark.sql("""
        SELECT g, maxIntersections(k % 100000, k % 100000 + CAST(x AS BIGINT) + 1) AS mi,
               intervalLengthSum(k % 100000, k % 100000 + CAST(x AS BIGINT) + 1) AS il
        FROM t GROUP BY g""").count()
    }

    spark.stop()
  }
}
