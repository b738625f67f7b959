package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse/MyScale behavioral-analytics aggregates over an event
  * stream, Spark-first (the reference engine's `windowFunnel`,
  * `retention` and the `(?1).*(?2)…` chain form of `sequenceMatch` —
  * ClickHouse "Parametric aggregate functions"; the events table is the
  * chat-memory/event-stream analog, `app/backend/chat_bot/tools.py`).
  *
  * The engine shape vs the SQL shape: a funnel over L stages written in
  * plain SQL is an L-way self-join per level (the oracle for q151 does
  * exactly that); the operator is ONE shuffle on the user key, a sorted
  * per-user event array, and a linear-pass DP per user
  * ([[org.apache.spark.sql.graft.FunnelLevel]]) — per-user state is
  * bounded by that user's matched events, the aggregation is
  * map-side-combined by Spark's collect_list, and nothing about the plan
  * changes at 100 TB except the number of user partitions.
  *
  * Stage conditions must be DISJOINT per row (each event matches at most
  * one stage — the event-type-equality shape); multi-match rows take the
  * LOWEST stage. Semantics of the level (documented contract, mirrored
  * by the DuckDB oracle): max L such that some events e1 < e2 < … < eL
  * (strictly increasing ts) have stage(ei) = i and ts(eL) − ts(e1) ≤
  * window.
  */
object Funnel {

  /** (user, level) for every user with ≥1 stage-matched event.
    * `window` in the ts column's native unit semantics (microseconds).
    *
    * `mode`: [[org.apache.spark.sql.graft.FunnelLevel.StrictOrder]] |
    * [[org.apache.spark.sql.graft.FunnelLevel.StrictDedup]] bitmask
    * (ClickHouse windowFunnel 'strict_order'/'strict_dedup'; 0 = the
    * default, oracle-gated semantics). Under strict_order the shuffle
    * carries ALL of the user's events (non-matching rows are the
    * interrupters), so its per-event cost is the full stream — the same
    * trade ClickHouse makes.
    */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
      windowMicros: Long, stages: Seq[Column], mode: Int = 0): DataFrame = {
    require(stages.nonEmpty, "windowFunnel needs at least one stage")
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    val strictOrder = (mode & org.apache.spark.sql.graft.FunnelLevel.StrictOrder) != 0
    val stageIdx = stages.zipWithIndex.foldRight(lit(0)) {
      case ((cond, i), rest) => when(cond, lit(i + 1)).otherwise(rest)
    }
    val matched = events
      .withColumn("__stage", stageIdx)
      // strict_order needs the non-matching events too: they interrupt
      .filter(if (strictOrder) lit(true) else col("__stage") > 0)
      .select(col(userCol), unix_micros(col(tsCol)).as("__ts"), col("__stage"))
    val lvl = toColumn(org.apache.spark.sql.graft.FunnelLevel(
      toExpr(sort_array(collect_list(struct(col("__ts"), col("__stage"))))),
      toExpr(lit(windowMicros)), toExpr(lit(stages.length)), mode))
    val out = matched.groupBy(col(userCol)).agg(lvl.as("level"))
    // keep the output contract mode-independent: only users with >=1
    // matched event appear (under strict_order unmatched-only users
    // would otherwise surface with level 0)
    if (strictOrder)
      out.join(events.filter(stageIdx > 0).select(col(userCol)).distinct(),
        Seq(userCol), "left_semi")
    else out
  }

  /** ClickHouse `retention(cond1, …)` per user: r1 = any(cond1);
    * ri = any(cond1) AND any(condi) for i ≥ 2 — flags, not a sequence.
    */
  def retention(events: DataFrame, userCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val anys = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, lit(1)).otherwise(lit(0))).as(s"__a${i + 1}")
    }
    val flags = col("__a1").as("r1") +: conds.indices.drop(1).map(i =>
      (col("__a1") === 1 && col(s"__a${i + 1}") === 1).cast("int").as(s"r${i + 1}"))
    events.groupBy(col(userCol)).agg(anys.head, anys.tail: _*)
      .select(col(userCol) +: flags: _*)
  }

  /** `sequenceMatch('(?1).*(?2)…')` chain form: did the user hit every
    * stage in order (strictly increasing ts), with no window bound? ==
    * windowFunnel at an unbounded window reaching the last stage.
    */
  def sequenceMatchChain(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[Column]): DataFrame =
    windowFunnel(events, userCol, tsCol, Long.MaxValue / 4, stages)
      .select(col(userCol), (col("level") === stages.length).cast("int").as("matched"))

  /** Full ClickHouse `sequenceMatch('pattern')` over the event stream:
    * `(?N)` steps, `.*` gaps, `(?t OP seconds)` time constraints, with
    * the ClickHouse adjacency contract (steps with no `.*` between them
    * must be adjacent AMONG condition-matching events — unlisted events
    * are invisible, listed ones break adjacency). Same one-shuffle plan
    * shape; the kernel is [[org.apache.spark.sql.graft.SequencePattern]]
    * (reachability DP, O(n log n · L) per user). The `.*`-only chain form
    * should prefer [[sequenceMatchChain]] (O(n·L) FunnelLevel kernel).
    */
  def sequenceMatchPattern(events: DataFrame, userCol: String, tsCol: String,
      pattern: String, stages: Seq[Column]): DataFrame = {
    require(stages.nonEmpty, "sequenceMatchPattern needs at least one condition")
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    val stageIdx = stages.zipWithIndex.foldRight(lit(0)) {
      case ((cond, i), rest) => when(cond, lit(i + 1)).otherwise(rest)
    }
    val matched = events
      .withColumn("__stage", stageIdx)
      .filter(col("__stage") > 0)
      .select(col(userCol), unix_micros(col(tsCol)).as("__ts"), col("__stage"))
    val m = toColumn(org.apache.spark.sql.graft.SequencePattern(
      toExpr(sort_array(collect_list(struct(col("__ts"), col("__stage"))))),
      toExpr(lit(stages.length)), pattern))
    matched.groupBy(col(userCol)).agg(m.cast("int").as("matched"))
  }

  /** `sequenceCount('(?1).*(?2)…')` chain form: how many NON-OVERLAPPING
    * completed stage-1→…→L chains per user, matched greedily in ts order
    * (ClickHouse restarts the search after each match). Same plan shape
    * as [[windowFunnel]] — one user-key shuffle, sorted per-user array,
    * linear kernel ([[org.apache.spark.sql.graft.ChainCount]]).
    */
  def sequenceCount(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[Column]): DataFrame = {
    require(stages.nonEmpty, "sequenceCount needs at least one stage")
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    val stageIdx = stages.zipWithIndex.foldRight(lit(0)) {
      case ((cond, i), rest) => when(cond, lit(i + 1)).otherwise(rest)
    }
    val matched = events
      .withColumn("__stage", stageIdx)
      .filter(col("__stage") > 0)
      .select(col(userCol), unix_micros(col(tsCol)).as("__ts"), col("__stage"))
    val cnt = toColumn(org.apache.spark.sql.graft.ChainCount(
      toExpr(sort_array(collect_list(struct(col("__ts"), col("__stage"))))),
      toExpr(lit(stages.length))))
    matched.groupBy(col(userCol)).agg(cnt.as("n_matches"))
  }
}
