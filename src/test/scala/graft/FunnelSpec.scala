package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** [[org.apache.spark.sql.graft.FunnelLevel]] semantics pinned on
  * hand-built event sequences (the contract the q151 oracle mirrors with
  * self-joins): strictly increasing timestamps, window measured from the
  * chain's FIRST event, latest-start maximization, equal-ts two-phase.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def level(events: Seq[(Long, Long, Int)], window: Long,
      stages: Int): Map[Long, Int] = {
    val df = events.toDF("user_id", "ts_us", "stage")
      .select(col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("stage"))
    Funnel.windowFunnel(df, "user_id", "ts", window,
      (1 to stages).map(i => col("stage") === i))
      .as[(Long, Int)].collect().toMap
  }

  test("basic chains, window from the chain start, strict ordering") {
    val m = level(Seq(
      // user 1: clean 1→2→3 inside the window
      (1L, 100L, 1), (1L, 150L, 2), (1L, 190L, 3),
      // user 2: stage 3 lands outside the window measured from e1
      (2L, 100L, 1), (2L, 150L, 2), (2L, 260L, 3),
      // user 3: out-of-order (2 before 1): only level 1
      (3L, 100L, 2), (3L, 150L, 1),
      // user 4: equal timestamps never chain (strictness)
      (4L, 100L, 1), (4L, 100L, 2),
      // user 5: only stage 2 events → present with level 0
      (5L, 100L, 2)), window = 100L, stages = 3)
    assert(m === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1, 5L -> 0))
  }

  test("latest chain start wins: a later stage-1 re-opens the window") {
    // e1@0, e2@90, then the chain start RENEWS at 100; e2@150, e3@190
    // fits the window only from the renewed start
    val m = level(Seq(
      (1L, 0L, 1), (1L, 90L, 2), (1L, 100L, 1), (1L, 150L, 2), (1L, 190L, 3)),
      window = 100L, stages = 3)
    assert(m === Map(1L -> 3))
    // without the renewal (same events minus the second stage-1) the
    // stage-3 probe at 190 is outside 0+100
    val m2 = level(Seq(
      (1L, 0L, 1), (1L, 90L, 2), (1L, 150L, 2), (1L, 190L, 3)),
      window = 100L, stages = 3)
    assert(m2 === Map(1L -> 2))
  }

  test("retention flags and sequence-match chain") {
    val df = Seq(
      (1L, 100L, "signup"), (1L, 200L, "purchase"),
      (2L, 100L, "purchase"), (2L, 200L, "signup"),
      (3L, 100L, "signup")).toDF("user_id", "ts_us", "event_type")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_type"))
    val rm = Funnel.retention(df, "user_id",
      Seq(col("event_type") === "signup", col("event_type") === "purchase"))
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // retention is FLAGS (any order): user 2 counts r2 even though the
    // purchase precedes the signup
    assert(rm === Map(1L -> (1, 1), 2L -> (1, 1), 3L -> (1, 0)))
    // sequenceMatch is ORDERED: user 2 does not match
    val sm = Funnel.sequenceMatchChain(df, "user_id", "ts",
      Seq(col("event_type") === "signup", col("event_type") === "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(sm === Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  private def levelMode(events: Seq[(Long, Long, Int)], window: Long,
      stages: Int, mode: Int): Map[Long, Int] = {
    // stage 0 rows = events matching no condition (strict_order
    // interrupters); the operator maps them via a never-true condition
    val df = events.toDF("user_id", "ts_us", "stage")
      .select(col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("stage"))
    Funnel.windowFunnel(df, "user_id", "ts", window,
      (1 to stages).map(i => col("stage") === i), mode)
      .as[(Long, Int)].collect().toMap
  }

  test("strict_order: a non-matching or out-of-order event ends the search") {
    import org.apache.spark.sql.graft.FunnelLevel.StrictOrder
    val abdc = Seq( // the ClickHouse doc example: A,B,D,C -> 2 (D = stage 0)
      (1L, 100L, 1), (1L, 110L, 2), (1L, 120L, 0), (1L, 130L, 3))
    assert(levelMode(abdc, 1000L, 3, 0) === Map(1L -> 3)) // default: D ignored
    assert(levelMode(abdc, 1000L, 3, StrictOrder) === Map(1L -> 2))
    // clean A,B,C unaffected
    val abc = Seq((2L, 100L, 1), (2L, 110L, 2), (2L, 120L, 3))
    assert(levelMode(abc, 1000L, 3, StrictOrder) === Map(2L -> 3))
    // an event matching SOME stage in order is not an interruption: the
    // intervening A only renews the chain start (ClickHouse single-chain
    // state keeps the higher slots)
    val abac = Seq(
      (3L, 100L, 1), (3L, 110L, 2), (3L, 120L, 1), (3L, 130L, 3))
    assert(levelMode(abac, 1000L, 3, StrictOrder) === Map(3L -> 3))
    // an out-of-order stage (C with no B yet) ends the search too
    val acb = Seq(
      (5L, 100L, 1), (5L, 110L, 3), (5L, 120L, 2))
    assert(levelMode(acb, 1000L, 3, StrictOrder) === Map(5L -> 1))
    // users whose events ALL miss every stage do not appear even though
    // strict_order ships their rows as interrupters
    val only0 = Seq((4L, 100L, 0), (4L, 110L, 0))
    assert(levelMode(only0, 1000L, 3, StrictOrder) === Map.empty[Long, Int])
  }

  test("strict_dedup: a repeated stage terminates the search at that stage") {
    import org.apache.spark.sql.graft.FunnelLevel.StrictDedup
    val abbc = Seq(
      (1L, 100L, 1), (1L, 110L, 2), (1L, 120L, 2), (1L, 130L, 3))
    assert(levelMode(abbc, 1000L, 3, 0) === Map(1L -> 3)) // default: dup harmless
    assert(levelMode(abbc, 1000L, 3, StrictDedup) === Map(1L -> 2))
    // stage-1 repeats never dedup-terminate: they restart the chain start
    val aabc = Seq(
      (2L, 100L, 1), (2L, 110L, 1), (2L, 120L, 2), (2L, 130L, 3))
    assert(levelMode(aabc, 1000L, 3, StrictDedup) === Map(2L -> 3))
    // stage-0 events never interrupt under dedup alone
    val abd0c = Seq(
      (3L, 100L, 1), (3L, 110L, 2), (3L, 120L, 0), (3L, 130L, 3))
    assert(levelMode(abd0c, 1000L, 3, StrictDedup) === Map(3L -> 3))
    // the documented ClickHouse quirk mirrored exactly: on stages 1..4,
    // A,B,C,B returns 2 — the dup's own stage — though A->B->C reached 3
    val abcb = Seq(
      (6L, 100L, 1), (6L, 110L, 2), (6L, 120L, 3), (6L, 130L, 2))
    assert(levelMode(abcb, 1000L, 4, StrictDedup) === Map(6L -> 2))
  }

  private def patternMatch(events: Seq[(Long, Long, Int)], stages: Int,
      pattern: String): Map[Long, Int] = {
    val df = events.toDF("user_id", "ts_us", "stage")
      .select(col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("stage"))
    Funnel.sequenceMatchPattern(df, "user_id", "ts", pattern,
      (1 to stages).map(i => col("stage") === i))
      .as[(Long, Int)].collect().toMap
  }

  test("sequenceMatch pattern: adjacency among matching events, gaps, time bounds") {
    // micros; conditions 1=A, 2=B, 3=C
    val evs = Seq(
      // user 1: A then B adjacent (among matched)
      (1L, 100L, 1), (1L, 200L, 2),
      // user 2: A, C, B — the C breaks (?1)(?2) adjacency but not (?1).*(?2)
      (2L, 100L, 1), (2L, 150L, 3), (2L, 200L, 2),
      // user 3: B before A only
      (3L, 100L, 2), (3L, 200L, 1))
    assert(patternMatch(evs, 3, "(?1)(?2)") === Map(1L -> 1, 2L -> 0, 3L -> 0))
    assert(patternMatch(evs, 3, "(?1).*(?2)") === Map(1L -> 1, 2L -> 1, 3L -> 0))
    // time constraints ride the transition: gap is 100 us here, so a
    // <=1 s bound passes and a >1 s bound fails (seconds per ClickHouse)
    assert(patternMatch(evs, 3, "(?1)(?t<=1)(?2)") === Map(1L -> 1, 2L -> 0, 3L -> 0))
    val far = Seq((1L, 0L, 1), (1L, 3000000L, 2)) // 3 s apart, adjacent
    assert(patternMatch(far, 2, "(?1)(?t<=1)(?2)") === Map(1L -> 0))
    assert(patternMatch(far, 2, "(?1)(?t>1)(?2)") === Map(1L -> 1))
    assert(patternMatch(far, 2, "(?1)(?t==3)(?2)") === Map(1L -> 1))
    // .* with a time bound: exists SOME earlier step-1 within the bound
    val multi = Seq(
      (1L, 0L, 1), (1L, 500000L, 3), (1L, 4000000L, 1), (1L, 5000000L, 2))
    assert(patternMatch(multi, 3, "(?1).*(?t<=2)(?2)") === Map(1L -> 1))
    assert(patternMatch(multi, 3, "(?1).*(?t>4)(?2)") === Map(1L -> 1))
    assert(patternMatch(multi, 3, "(?1).*(?t>5)(?2)") === Map(1L -> 0))
    // three-step pattern with mixed adjacency
    val abc = Seq((1L, 0L, 1), (1L, 10L, 2), (1L, 20L, 3),
      (2L, 0L, 1), (2L, 10L, 3), (2L, 20L, 2), (2L, 30L, 3))
    assert(patternMatch(abc, 3, "(?1)(?2).*(?3)") === Map(1L -> 1, 2L -> 0))
    assert(patternMatch(abc, 3, "(?1).*(?2)(?3)") === Map(1L -> 1, 2L -> 1))
    // parser rejects malformed patterns
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.SequencePattern.parse("(?t<=5)(?1)")
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.SequencePattern.parse("(?1)(?t<=5)")
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.SequencePattern.parse("(?1)xx(?2)")
    }
  }

  test("SQL aggregates equal the operator path through real partial/merge") {
    // 16 input partitions force serialize/merge of every buffer; the
    // events table's real distribution exercises all levels
    val ev = Tables.events(spark, TestSpark.sf).repartition(16)
    ev.createOrReplaceTempView("ev_agg")
    val win = 24L * 3600
    val sqlRes = spark.sql(s"""
      SELECT user_id,
        windowFunnel($win, ts, event_type = 'view', event_type = 'click',
          event_type = 'purchase') AS level
      FROM ev_agg WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id""")
      .as[(Long, Int)].collect().toMap
    val opRes = Funnel.windowFunnel(ev, "user_id", "ts", win * 1000000L,
      Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(sqlRes.nonEmpty && sqlRes === opRes)
    assert(sqlRes.values.toSet.size > 1, "fixture must exercise multiple levels")
    // retention flags vs the operator
    val rSql = spark.sql("""
      SELECT user_id, retention(event_type = 'signup',
        event_type = 'purchase') AS r
      FROM ev_agg GROUP BY user_id""")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val rOp = Funnel.retention(ev, "user_id",
      Seq(col("event_type") === "signup", col("event_type") === "purchase"))
      .collect().map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2))).toMap
    assert(rSql === rOp)
    // construction-time validation is loud
    intercept[Exception] {
      spark.sql("SELECT sequenceCount('(?2).*(?1)', ts, event_type='a', event_type='b') FROM ev_agg").collect()
    }
  }

  private def chainCount(events: Seq[(Long, Long, Int)],
      stages: Int): Map[Long, Int] = {
    val df = events.toDF("user_id", "ts_us", "stage")
      .select(col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("stage"))
    Funnel.sequenceCount(df, "user_id", "ts",
      (1 to stages).map(i => col("stage") === i))
      .as[(Long, Int)].collect().toMap
  }

  test("sequenceCount: greedy non-overlapping chains, restart after match") {
    val m = chainCount(Seq(
      // user 1: 1,2,2,1,1,2 → two matches (greedy: 1@100+2@110, 1@130+2@150)
      (1L, 100L, 1), (1L, 110L, 2), (1L, 120L, 2),
      (1L, 130L, 1), (1L, 140L, 1), (1L, 150L, 2),
      // user 2: 2,1,2,1 → one match; trailing 1 never completes
      (2L, 100L, 2), (2L, 110L, 1), (2L, 120L, 2), (2L, 130L, 1),
      // user 3: stage-2 only → 0 matches (still present in output)
      (3L, 100L, 2)), stages = 2)
    assert(m === Map(1L -> 2, 2L -> 1, 3L -> 0))
  }

  test("sequenceCount: strict ts ordering, at most one advance per ts group") {
    val m = chainCount(Seq(
      // equal-ts 1 and 2 cannot chain together; the later 2 completes
      (1L, 100L, 1), (1L, 100L, 2), (1L, 200L, 2),
      // user 2: a chain completing at ts=200 does not restart within the
      // same group (the 1@200 is ignored), so the 2@300 finds no open chain
      (2L, 100L, 1), (2L, 200L, 2), (2L, 200L, 1), (2L, 300L, 2)),
      stages = 2)
    assert(m === Map(1L -> 1, 2L -> 1))
  }

  test("sequenceCount: three stages, events off-chain are skipped gaps") {
    val m = chainCount(Seq(
      // 1,3,2,1,3 → one match (1@100, 2@120, 3@140); interleaved 3@110 and
      // 1@130 are the `.*` gaps
      (1L, 100L, 1), (1L, 110L, 3), (1L, 120L, 2), (1L, 130L, 1), (1L, 140L, 3),
      // two full chains back-to-back
      (2L, 100L, 1), (2L, 110L, 2), (2L, 120L, 3),
      (2L, 130L, 1), (2L, 140L, 2), (2L, 150L, 3)), stages = 3)
    assert(m === Map(1L -> 1, 2L -> 2))
  }
}
