package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.QueryDef.dec

/** Structured Streaming slice over the `events` stream table
  * (capability extension, SURVEY.md §2.9: the reference's closest analog
  * is the append-only chat-memory table, `app/backend/chat_bot/
  * tools.py:63-82`; TESTDATA.md designates `events` as the stream table).
  *
  * Transform builders are shared between batch and streaming DataFrames —
  * the Structured Streaming contract — so correctness of the streaming
  * path is checked by equality with the oracle-verified batch twin
  * (see `StreamingSpec`).
  */
object EventsStream {

  /** Normalize a raw events frame (either `ts` encoding — see
    * [[graft.Tables.normalizeTs]]) to the session-timezone contract.
    */
  def fromRaw(df: DataFrame): DataFrame = graft.Tables.normalizeTs(df)

  /** Tumbling 1 h windows: count + exact decimal sum per (window, type). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Sliding 2 h windows every 1 h. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Watermarked variant for true streaming use (late data dropped after
    * 30 min); append-mode compatible.
    */
  def tumblingWithWatermark(events: DataFrame): DataFrame =
    tumblingKeyed(events.withWatermark("ts", "30 minutes"))

  private def tumblingKeyed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming exact dedup — the streaming half of the corpus dedup story
    * (batch: q40 exact groupBy, q48 fingerprints; clusters: q109).
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes, so state is bounded by (arrival rate × delay), not
    * by stream length — the property a 100 TB/day ingest needs. Dedup key
    * is a content fingerprint, not the event id, so re-delivered payloads
    * dedup even when ids differ. The fingerprint hashes the
    * `to_json(struct(...))` encoding, which PRESERVES NULL POSITIONS:
    * `concat_ws` silently skips null columns, so two events differing only
    * in which nullable field is null would otherwise collide.
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    events
      .withColumn("fp", sha2(to_json(struct(
        col("user_id"), col("event_type"), col("value"), col("props")),
        Map("ignoreNullFields" -> "false")), 256))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Typed event row for stateful ops. */
  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Custom streaming state: running per-user event counts via
    * `mapGroupsWithState` (the reference's chat-memory is exactly an
    * append stream keyed by session, `app/backend/chat_bot/tools.py:63-82`;
    * this is the KeyValueGroupedDataset stateful surface of SURVEY §2.9).
    */
  def runningUserCounts(events: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          (user, n)
      }
  }

  /** Open per-user session being accumulated across micro-batches. */
  final case class OpenSession(start: Long, last: Long, n: Int)

  /** A session closed either by an in-batch gap or an event-time timeout. */
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  /** Gap-based sessionization as CUSTOM STREAMING STATE:
    * `flatMapGroupsWithState` with an event-time timeout (SURVEY §2.9 /
    * §2.10 — the stateful surface beyond mapGroupsWithState). Sessions
    * closed by a gap inside a batch are emitted immediately; the trailing
    * open session is parked in `GroupState` with a timeout at
    * `last + gap`, so it is emitted once the watermark passes it — the
    * streaming twin of q34's lag/cumsum batch sessionizer.
    *
    * State is one `OpenSession` (24 bytes) per ACTIVE user, not per event
    * — at 100 TB/day of events the state store holds only concurrently
    * live sessions, and the event-time timeout GCs abandoned ones.
    */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[Event],
      gapMinutes: Int = 15): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          def close(s: OpenSession) = ClosedSession(user,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val times = it.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some(s) if t < s.start - gapMs =>
                  // an out-of-order event a full gap BEFORE the open
                  // session belongs to a past session; emit it as its own
                  // singleton rather than silently bridging (only reachable
                  // when gap < watermark delay)
                  closed ::= ClosedSession(user,
                    new java.sql.Timestamp(t), new java.sql.Timestamp(t), 1)
                  cur
                case Some(s) if t - s.last <= gapMs =>
                  // out-of-order arrivals (t inside the watermark allowance
                  // but older than state) must never move the session end
                  // or its timeout BACKWARDS; they can extend the start
                  Some(OpenSession(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= close(s)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }

  /** Per-user funnel DP state carried across micro-batches: `start(s)` =
    * latest chain-start micros among chains that reached stage s+1
    * (Long.MinValue = unreached), plus the best level so far — O(L) per
    * ACTIVE user, never per event, so at 100 TB/day the state store holds
    * L longs per live user.
    */
  final case class FunnelState(start: Array[Long], best: Int)

  /** STREAMING windowFunnel: the q151 behavioral aggregate maintained
    * incrementally with `mapGroupsWithState` — the FunnelLevel DP is
    * online-updatable because `start(s)` only ever moves FORWARD (latest-
    * start maximization is monotone), so carrying the L-slot array across
    * micro-batches and replaying each batch's events in ts order yields
    * exactly the batch level. Equal-ts groups use the same two-phase
    * update as the batch kernel; events must arrive batch-monotonically
    * (a later micro-batch carries no ts below an earlier batch's — the
    * append-only chat-memory shape, `app/backend/chat_bot/tools.py:63-82`;
    * an equal-ts GROUP split across two batches weakens strictness to
    * per-batch, the one divergence from the batch kernel).
    * Emits (user, level) in update mode whenever the level could change.
    */
  def funnelStateful(events: org.apache.spark.sql.Dataset[Event],
      windowMicros: Long, stages: Seq[Event => Boolean])
      : org.apache.spark.sql.Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val nStages = stages.length
    require(nStages > 0, "funnelStateful needs at least one stage")
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: org.apache.spark.sql.streaming.GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(
            FunnelState(Array.fill(nStages + 1)(Long.MinValue), 0))
          val start = st.start.clone()
          var best = st.best
          // this batch's matched events, ts-sorted (stage = first matching
          // condition, 1-based; ties impossible for disjoint conditions)
          val evs = it.flatMap { e =>
            val s = stages.indexWhere(p => p(e)) + 1
            // full micros (getTime is ms-truncated; sub-ms lives in nanos)
            val micros = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
              e.ts.getNanos / 1000L
            if (s > 0) Some((micros, s)) else None
          }.toArray.sortInPlaceBy(_._1)
          var i = 0
          while (i < evs.length) {
            val ts = evs(i)._1
            var j = i
            val pend = Array.fill(nStages + 1)(Long.MinValue)
            while (j < evs.length && evs(j)._1 == ts) {
              val s = evs(j)._2
              if (s == 1) { if (ts > pend(1)) pend(1) = ts }
              else {
                val prev = start(s - 1)
                if (prev != Long.MinValue && ts - prev <= windowMicros &&
                  prev > pend(s)) pend(s) = prev
              }
              j += 1
            }
            var s = 1
            while (s <= nStages) {
              if (pend(s) > start(s)) { start(s) = pend(s); if (s > best) best = s }
              s += 1
            }
            i = j
          }
          state.update(FunnelState(start, best))
          (user, best)
      }
  }

  /** STREAM-STREAM interval join: purchases matched to the same user's
    * views within the preceding hour. Both sides are watermarked so the
    * join state is bounded — Spark buffers only rows inside
    * (watermark - interval), the condition every stream-stream join needs
    * to run forever. Batch twin = the same join condition on static
    * frames (StreamingSpec proves equality).
    */
  def purchasesWithRecentViews(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = views.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
    p.join(v, p("user_id") === v("user_id") &&
      col("v_ts") <= col("p_ts") &&
      col("v_ts") >= col("p_ts") - org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), p("user_id"), col("view_id"), col("p_ts"), col("v_ts"))
  }

  /** Stream-static enrichment join: each micro-batch joins against the
    * static dimension (re-read per batch, so slowly-changing dims pick up
    * updates). The standard "enrich the event stream" shape.
    */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(userDim), Seq("user_id"))

  /** Open a file-based stream over a directory containing events parquet
    * (maxFilesPerTrigger=1 so multiple files arrive as micro-batches).
    * Streaming readers need a declared schema; probe it with a one-off
    * batch read of the same directory (footer-only, no data scan) so the
    * stream survives either `ts` encoding the testdata has shipped with.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val probed: StructType = spark.read.parquet(dir).schema
    fromRaw(spark.readStream.schema(probed)
      .option("maxFilesPerTrigger", "1").parquet(dir))
  }
}
