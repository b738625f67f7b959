package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DictCatalog

/** Honest measurement for the dictionary tier (q170): does the
  * broadcast-map `dictGet` probe actually beat Spark's broadcast hash
  * join for enrichment at 20M rows, for a small (25-key) and a larger
  * (100k-key) dimension? The probe is a CodegenFallback expression (one
  * boxed map get per row) while the join is whole-stage-codegen'd — the
  * answer is NOT obvious, and the loser still matters: CH guidance is
  * dictGet for expression-level enrichment (inside CASE/WHERE/nested
  * calls, where a join cannot go) and joins for bulk row-widening.
  * Results + guidance recorded in PLANS.md ("Dictionary probe vs
  * broadcast join"). Not driver-run.
  */
object DictSoak {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SOAK_ROWS", "20000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)

    val fact = spark.range(n).select(
      pmod(xxhash64(col("id"), lit(1)), lit(25)).as("small_k"),
      pmod(xxhash64(col("id"), lit(2)), lit(100000)).as("big_k"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000)).cast("double").as("v"))
      .cache()
    fact.count()

    def dim(keys: Long) = spark.range(keys).select(col("id").as("k"),
      concat(lit("name_"), col("id")).as("nm"),
      (col("id") % 7).as("grp"))
    val smallDim = dim(25).cache(); smallDim.count()
    val bigDim = dim(100000).cache(); bigDim.count()
    DictCatalog.register(spark, "small", smallDim, "k")
    DictCatalog.register(spark, "big", bigDim, "k")
    fact.createOrReplaceTempView("f")

    def bench(name: String)(body: => Long): Unit = {
      body
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-34s $best%6.3f s  ${n / best / 1e6}%6.1f M rows/s")
    }

    println(s"rows=$n  dims: 25 and 100k keys")
    bench("join small dim (broadcast)") {
      fact.join(broadcast(smallDim), fact("small_k") === smallDim("k"))
        .groupBy("nm").agg(sum("v")).collect().length
    }
    bench("dictGet small dim") {
      spark.sql("""SELECT dictGet('small', 'nm', small_k) AS nm, sum(v)
                   FROM f GROUP BY 1""").collect().length
    }
    bench("join big dim (broadcast)") {
      fact.join(broadcast(bigDim), fact("big_k") === bigDim("k"))
        .groupBy("grp").agg(sum("v")).collect().length
    }
    bench("dictGet big dim") {
      spark.sql("""SELECT dictGet('big', 'grp', big_k) AS grp, sum(v)
                   FROM f GROUP BY 1""").collect().length
    }
    // the shape a join cannot express inline: dict probe inside a filter
    bench("dictHas filter (probe in WHERE)") {
      spark.sql("""SELECT count(*) FROM f
                   WHERE dictHas('big', big_k) AND big_k % 3 = 0""")
        .collect().length
    }
    spark.stop()
  }
}
