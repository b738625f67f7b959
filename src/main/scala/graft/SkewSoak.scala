package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew soak: measure — not argue — the hot-key story at scale. A
  * Zipf-extreme corpus (ONE key owns ~half the rows, the 100 TB "viral
  * session" shape) drives a shuffle sort-merge join against a dim table
  * under three treatments:
  *
  *   1. baseline: AQE skew-join OFF — the straggler shape (one reducer
  *      drags the stage; per-task max vs median duration is the
  *      evidence);
  *   2. AQE skew-join ON (stock Spark) — OptimizeSkewedJoin splits the
  *      fat partition; assert the plan actually says `isSkew=true` so
  *      the measurement is of the mechanism, not luck;
  *   3. graft.operators.Salting.saltedJoin — the pre-AQE portable
  *      treatment (and the only one that also covers
  *      broadcast-replicate and aggregation shapes).
  *
  * All three must agree on the result checksum. Not driver-run; results
  * committed in PLANS.md ("Skew soak").
  */
object SkewSoak {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SOAK_ROWS", "8000000").toLong
    def build(aqeSkew: Boolean): SparkSession = {
      val b = SparkSession.builder().master("local[32]")
        .appName(s"skew-$aqeSkew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
        // keep AQE from sidestepping the experiment entirely
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        // make the fat partition count as skewed at this corpus size
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // fact: half the rows on key 0, the rest Zipf-ish across 100k keys;
    // dim: one row per key with a payload to aggregate after the join
    def fact(s: SparkSession) = s.range(rows).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("k"),
      (col("id") % 1000).as("v"))
    def dim(s: SparkSession) = s.range(100000).select(
      col("id").as("k"), (col("id") * 7 % 997).as("w"))

    def run(s: SparkSession, salted: Boolean): (Long, Double, String) = {
      val joined =
        if (salted) graft.operators.Salting.saltedJoin(fact(s), dim(s), "k", 32)
        else fact(s).join(dim(s), "k")
      val agg = joined.agg(sum(col("v") * col("w")).as("chk"))
      val (chk, wall) = timed(agg.collect()(0).getLong(0))
      (chk, wall, agg.queryExecution.executedPlan.toString)
    }

    // 1. baseline: skew-join off
    val s1 = build(aqeSkew = false)
    val (chk1, w1, _) = run(s1, salted = false)
    val (chk1b, w1b, _) = run(s1, salted = false) // warm repeat
    s1.stop()
    // 2. AQE skew-join on
    val s2 = build(aqeSkew = true)
    val (chk2, w2, plan2) = run(s2, salted = false)
    val (chk2b, w2b, _) = run(s2, salted = false)
    val skewFired = plan2.contains("isSkew=true") || plan2.contains("skewed")
    // 3. salted join (AQE skew off — salting is the whole treatment)
    s2.stop()
    val s3 = build(aqeSkew = false)
    val (chk3, w3, _) = run(s3, salted = true)
    val (chk3b, w3b, _) = run(s3, salted = true)

    println(s"rows=$rows hot-key share=50%")
    println(f"baseline (skew-join OFF): ${w1}%6.2f s cold / ${w1b}%6.2f s warm")
    println(f"AQE skew-join ON:         ${w2}%6.2f s cold / ${w2b}%6.2f s warm  skew-split fired=$skewFired")
    println(f"Salting.saltedJoin:       ${w3}%6.2f s cold / ${w3b}%6.2f s warm")
    println(s"checksums agree=${chk1 == chk2 && chk2 == chk3 && chk1 == chk1b && chk2 == chk2b && chk3 == chk3b} (chk=$chk1)")
    s3.stop()
  }
}
