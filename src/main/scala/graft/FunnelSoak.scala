package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Behavioral-aggregate scale soak: the ClickHouse funnel family
  * (q151/q153/q156 — windowFunnel / sequenceMatch / sequenceCount) and
  * the combinator aggregates (q154/q158 shapes) at 20M events — 2000x the
  * sf0.01 gate corpus — with a deliberately SKEWED user (one "bot" user
  * carrying ~1% of all events), because the funnel plan's only scale
  * surface is the per-user collect_list: state is O(events-per-user) for
  * exactly one job, and the hot key is the worst case a 100 TB event log
  * will actually serve.
  *
  * Corpus is generated map-only and PARTITIONING-INDEPENDENTLY
  * (xxhash64 of the event id drives user, type and ts), so reruns and
  * different CPU counts see identical data — same recipe as
  * [[ZipfCorpus]]/[[ClusteredCorpus]].
  *
  * Measured per phase: wall seconds, events/s, shuffle bytes written
  * (the one user-key shuffle is the plan's entire data movement — bytes
  * per input event is the number that must stay flat at 100 TB), and the
  * hot user's own event count vs the observed max funnel array. Results
  * committed in PLANS.md ("Behavioral aggregates at 20M events").
  * Not driver-run.
  */
object FunnelSoak {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SOAK_EVENTS", "20000000").toLong
    val nUsers = sys.env.getOrElse("SOAK_USERS", "200000").toLong
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

    // 60 days of events; ~1% land on user 0 (the bot), rest uniform.
    // All fields derive from xxhash64(event_id, salt): map-only, exact
    // same rows at any parallelism.
    val spanMicros = 60L * 24 * 3600 * 1000000L
    val base = 1704067200000000L // 2024-01-01 UTC
    val ev = spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(base) +
        pmod(xxhash64(col("id"), lit(1)), lit(spanMicros))).as("ts"),
      when(pmod(xxhash64(col("id"), lit(2)), lit(100)) < 1, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(3)), lit(nUsers))).as("user_id"),
      element_at(
        array(lit("view"), lit("view"), lit("view"), lit("view"),
          lit("click"), lit("click"), lit("click"),
          lit("purchase"), lit("signup"), lit("error")),
        (pmod(xxhash64(col("id"), lit(4)), lit(10)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id"), lit(5)), lit(10000)) / 100.0).as("value"))

    def phase(name: String)(body: => Long): Unit = {
      body // warm once (codegen + JIT)
      val reps = 3
      val times = (1 to reps).map { _ =>
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val rows = body
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, rows, shuffleBytes.get)
      }
      val best = times.minBy(_._1)
      println(f"$name%-22s ${best._1}%7.2f s  ${nEvents / best._1 / 1e6}%6.2f M ev/s  " +
        f"out_rows=${best._2}%,d  shuffle=${best._3 / 1048576}%,d MB " +
        f"(${best._3.toDouble / nEvents}%.1f B/event)")
    }

    val stages = Seq(col("event_type") === "view",
      col("event_type") === "click", col("event_type") === "purchase")
    val win = 24L * 3600 * 1000000

    println(s"events=$nEvents users=$nUsers (user 0 = hot ~1%)")
    val hot = ev.filter(col("user_id") === 0).count()
    println(f"hot-user events: $hot%,d (${hot * 100.0 / nEvents}%.2f%% of corpus)")

    phase("windowFunnel") {
      val lvl = operators.Funnel.windowFunnel(ev, "user_id", "ts", win, stages)
      lvl.groupBy("level").count().collect().sortBy(_.getInt(0)).foreach { r =>
        if (r.getLong(1) > 0 && sys.env.contains("SOAK_VERBOSE"))
          println(s"  level ${r.getInt(0)}: ${r.getLong(1)}")
      }
      lvl.count()
    }

    // same funnel through the SQL AGGREGATE path (WindowFunnelAgg packed
    // buffer, partial ObjectHashAggregate) vs the operator path above
    // (collect_list of structs + FunnelLevel expression) — both one
    // shuffle; the packed buffer pre-reduces NOTHING (funnel state is
    // not mergeable) but ships primitive pairs instead of struct rows
    phase("windowFunnelSqlAgg") {
      ev.createOrReplaceTempView("soak_ev")
      val lvl = ev.sparkSession.sql("""
        SELECT user_id, windowFunnel(86400, ts, event_type = 'view',
          event_type = 'click', event_type = 'purchase') AS level
        FROM soak_ev WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY user_id""")
      lvl.groupBy("level").count().collect()
      nUsers
    }

    phase("sequenceCount") {
      operators.Funnel.sequenceCount(ev, "user_id", "ts",
        Seq(col("event_type") === "signup", col("event_type") === "purchase"))
        .agg(sum("n_matches")).collect()
      nUsers
    }

    phase("retention") {
      operators.Funnel.retention(ev, "user_id",
        Seq(col("event_type") === "signup", col("event_type") === "purchase",
          col("event_type") === "error")).count()
    }

    phase("aggCombinators") {
      ev.groupBy("event_type").agg(
        expr("countIf(value > 50.0)"), expr("sumIf(value, user_id % 2 = 0)"),
        expr("argMax(event_id, ts)"), expr("uniqExact(user_id)"))
        .collect()
      5L
    }

    // same battery with uniq (HLL++) in place of uniqExact: the exact
    // distinct forces Spark's two-phase distinct expansion (a shuffle of
    // every (group, user) pair — ~20 B/event); the sketch shuffles only
    // per-task HLL buffers
    phase("aggCombinatorsHll") {
      ev.groupBy("event_type").agg(
        expr("countIf(value > 50.0)"), expr("sumIf(value, user_id % 2 = 0)"),
        expr("argMax(event_id, ts)"), expr("uniq(user_id)"))
        .collect()
      5L
    }

    phase("sumMap") {
      ev.groupBy(pmod(col("user_id"), lit(10)).as("cohort"))
        .agg(expr("sumMap(array(event_type, 'all'), array(value, value))"))
        .collect()
      10L
    }

    spark.stop()
  }
}
