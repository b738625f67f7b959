package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder
import graft.operators.{GraphAnn, SelfQueryFilter => F}

/** Round-9 battery: SELECTIVITY-DISPATCHED filtered ANN (the r7/r8
  * verdict's last structural item — "an engine chooses").
  *
  * The reference's dominant query is filtered k-NN
  * (`app/backend/retriever/myscale_without_metadata.py:20-36`,
  * `docs/self-query.md:104`), and it never asks the CALLER to know
  * whether the predicate is scarce: the engine plans. These queries gate
  * [[graft.operators.GraphAnn!.topKBatchAuto]] end-to-end against the
  * q121/q129 oracle recipe, with the dispatch decision ASSERTED inside
  * the query (a wrong path choice fails the query, so the CORRECTNESS
  * artifact records it):
  *
  *   - q149: ~0.5% survivors → the dispatcher must pick the exact brute
  *     force over the graph's own pinned blocks (the filtered beam
  *     degrades toward full traversal exactly here — [[GraphAnn]] beam
  *     doc), and the result is oracle-exact BY CONSTRUCTION (brute is
  *     exhaustive over survivors).
  *   - q150: ~50% survivors → the dispatcher must keep the beam; full ef
  *     makes the beam exhaustive (q114's exactness contract), so the
  *     same oracle gates the path choice AND the results.
  *
  * The meta column derives arithmetically from `vec_id` (Round8Queries'
  * recipe: deterministic, SF-independent, expressed identically in both
  * engines): lbl = vec_id % 200 → Eq hits 0.5%, Lte(99) hits 50%.
  */
object Round9Queries {

  private val qText = "filtered vector search dispatch"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  private def corpus(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        (col("vec_id") % 200).cast("long").as("lbl"))

  private def graph(s: org.apache.spark.sql.SparkSession, dir: String) =
    GraphAnn.buildCached(corpus(s, dir), dir + "#dispatch", "vec_id",
      "embedding", metaCols = Seq("lbl"))

  private def oracle(where: String): String = s"""
      SELECT vec_id,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q149_ann_dispatch_brute", (s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      val filter: Option[F.Node] = Some(F.Eq("lbl", F.I(7L)))
      val (res, _, usedBrute) =
        g.topKAuto(qVec, 10, ef = g.rows.toInt, filter = filter)
      require(usedBrute,
        "dispatcher must brute-force a ~0.5%-selectivity predicate")
      res.toSeq.toDF("vec_id", "dist")
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), round(col("dist"), 6).as("dist"))
    }, Some(oracle("vec_id % 200 = 7"))),

    QueryDef("q150_ann_dispatch_beam", (s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      val filter: Option[F.Node] = Some(F.Lte("lbl", F.I(99L)))
      val (res, _, usedBrute) =
        g.topKAuto(qVec, 10, ef = g.rows.toInt, filter = filter)
      require(!usedBrute,
        "dispatcher must beam-search a ~50%-selectivity predicate")
      res.toSeq.toDF("vec_id", "dist")
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), round(col("dist"), 6).as("dist"))
    }, Some(oracle("vec_id % 200 <= 99"))),

    // ---- ClickHouse behavioral aggregates over the event stream --------
    // (the reference engine's windowFunnel / retention / sequenceMatch —
    // ClickHouse "Parametric aggregate functions". The ENGINE shape is
    // one user-key shuffle + a linear per-user DP; the ORACLE is the
    // L-way self-join a SQL user would have to write — the plan gap the
    // operator exists to close.)

    QueryDef("q151_window_funnel", (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Funnel.windowFunnel(ev, "user_id", "ts",
        windowMicros = 24L * 3600 * 1000000,
        stages = Seq(col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH f AS (
        SELECT user_id, ts,
          CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
               WHEN 'purchase' THEN 3 END AS s
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
      ),
      l2 AS (
        SELECT DISTINCT a.user_id FROM f a
        JOIN f b ON b.user_id = a.user_id AND b.s = 2 AND b.ts > a.ts
                AND b.ts <= a.ts + INTERVAL 24 HOUR
        WHERE a.s = 1
      ),
      l3 AS (
        SELECT DISTINCT a.user_id FROM f a
        JOIN f b ON b.user_id = a.user_id AND b.s = 2 AND b.ts > a.ts
                AND b.ts <= a.ts + INTERVAL 24 HOUR
        JOIN f c ON c.user_id = a.user_id AND c.s = 3 AND c.ts > b.ts
                AND c.ts <= a.ts + INTERVAL 24 HOUR
        WHERE a.s = 1
      )
      SELECT u.user_id,
        CAST(CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                  WHEN u.user_id IN (SELECT user_id FROM f WHERE s = 1) THEN 1
                  ELSE 0 END AS INT) AS level
      FROM (SELECT DISTINCT user_id FROM f) u
      ORDER BY u.user_id""")),

    QueryDef("q152_retention", (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Funnel.retention(ev, "user_id",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase",
          col("event_type") === "error"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH a AS (
        SELECT user_id,
          max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS a1,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a2,
          max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS a3
        FROM events GROUP BY user_id)
      SELECT user_id,
        CAST(a1 AS INT) AS r1,
        CAST(CASE WHEN a1 = 1 AND a2 = 1 THEN 1 ELSE 0 END AS INT) AS r2,
        CAST(CASE WHEN a1 = 1 AND a3 = 1 THEN 1 ELSE 0 END AS INT) AS r3
      FROM a ORDER BY user_id""")),

    QueryDef("q153_sequence_match", (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Funnel.sequenceMatchChain(ev, "user_id", "ts",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH f AS (
        SELECT user_id, ts,
          CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2 END AS s
        FROM events WHERE event_type IN ('signup', 'purchase')
      ),
      m AS (
        SELECT DISTINCT a.user_id FROM f a
        JOIN f b ON b.user_id = a.user_id AND a.s = 1 AND b.s = 2
                AND b.ts > a.ts
      )
      SELECT u.user_id,
        CAST(CASE WHEN u.user_id IN (SELECT user_id FROM m) THEN 1
                  ELSE 0 END AS INT) AS matched
      FROM (SELECT DISTINCT user_id FROM f) u
      ORDER BY u.user_id""")),

    QueryDef("q156_sequence_count", (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Funnel.sequenceCount(ev, "user_id", "ts",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH f AS (
        SELECT user_id, ts,
          CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2 END AS s
        FROM events WHERE event_type IN ('signup', 'purchase')
      ),
      d AS (
        SELECT user_id, ts, s,
          lag(s) OVER (PARTITION BY user_id ORDER BY ts) AS ps
        FROM f
      ),
      c AS (SELECT user_id, ts, s FROM d WHERE ps IS NULL OR s <> ps),
      e AS (
        SELECT user_id, s,
          lag(s) OVER (PARTITION BY user_id ORDER BY ts) AS ps
        FROM c
      )
      SELECT user_id,
        CAST(count(*) FILTER (WHERE s = 2 AND ps = 1) AS INT) AS n_matches
      FROM e GROUP BY user_id ORDER BY user_id""")),

    // sequenceMatch with the FULL pattern language: adjacency (no .*
    // between steps — among condition-matching events) plus a time
    // constraint. The oracle is the lag-window closed form over the same
    // filtered stream with the same (ts, stage) tie order.
    QueryDef("q160_sequence_pattern", (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Funnel.sequenceMatchPattern(ev, "user_id", "ts",
        "(?1)(?t<=7200)(?2)",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH f AS (
        SELECT user_id, ts,
          CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2 END AS s
        FROM events WHERE event_type IN ('signup', 'purchase')
      ),
      d AS (
        SELECT user_id, s, ts,
          lag(s) OVER (PARTITION BY user_id ORDER BY ts, s) AS ps,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, s) AS pts
        FROM f
      ),
      m AS (
        SELECT DISTINCT user_id FROM d
        WHERE s = 2 AND ps = 1
          AND epoch_us(ts) - epoch_us(pts) <= 7200000000
      )
      SELECT user_id,
        CAST(CASE WHEN user_id IN (SELECT user_id FROM m) THEN 1
                  ELSE 0 END AS INT) AS matched
      FROM (SELECT DISTINCT user_id FROM f) u
      ORDER BY user_id""")),

    // ---- the behavioral aggregates as FIRST-CLASS SQL functions ---------
    // (what a ClickHouse user types, through spark.sql; same kernels as
    // the operator path via FunnelDp, same oracles as q151/q160. The
    // WHERE pre-filter pins the output user set to "users with >=1
    // stage-matched event", matching the oracle's.)

    QueryDef("q161_window_funnel_sql", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT user_id,
          windowFunnel(86400, ts,
            event_type = 'view', event_type = 'click',
            event_type = 'purchase') AS level
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY user_id ORDER BY user_id""")
    }, Some("""
      WITH f AS (
        SELECT user_id, ts,
          CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
               WHEN 'purchase' THEN 3 END AS s
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
      ),
      l2 AS (
        SELECT DISTINCT a.user_id FROM f a
        JOIN f b ON b.user_id = a.user_id AND b.s = 2 AND b.ts > a.ts
                AND b.ts <= a.ts + INTERVAL 24 HOUR
        WHERE a.s = 1
      ),
      l3 AS (
        SELECT DISTINCT a.user_id FROM f a
        JOIN f b ON b.user_id = a.user_id AND b.s = 2 AND b.ts > a.ts
                AND b.ts <= a.ts + INTERVAL 24 HOUR
        JOIN f c ON c.user_id = a.user_id AND c.s = 3 AND c.ts > b.ts
                AND c.ts <= a.ts + INTERVAL 24 HOUR
        WHERE a.s = 1
      )
      SELECT u.user_id,
        CAST(CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                  WHEN u.user_id IN (SELECT user_id FROM f WHERE s = 1) THEN 1
                  ELSE 0 END AS INT) AS level
      FROM (SELECT DISTINCT user_id FROM f) u
      ORDER BY u.user_id""")),

    QueryDef("q162_sequence_sql", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT user_id,
          CAST(sequenceMatch('(?1)(?t<=7200)(?2)', ts,
            event_type = 'signup', event_type = 'purchase') AS INT) AS matched,
          sequenceCount('(?1).*(?2)', ts,
            event_type = 'signup', event_type = 'purchase') AS n_matches,
          array_join(transform(
            retention(event_type = 'signup', event_type = 'purchase',
              event_type = 'error'), x -> CAST(x AS STRING)), ',') AS r
        FROM events
        WHERE event_type IN ('signup', 'purchase', 'error')
        GROUP BY user_id ORDER BY user_id""")
    }, Some("""
      WITH f AS (
        SELECT user_id, ts,
          CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2 END AS s
        FROM events WHERE event_type IN ('signup', 'purchase')
      ),
      d AS (
        SELECT user_id, s, ts,
          lag(s) OVER (PARTITION BY user_id ORDER BY ts, s) AS ps,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, s) AS pts
        FROM f
      ),
      sm AS (
        SELECT DISTINCT user_id FROM d
        WHERE s = 2 AND ps = 1
          AND epoch_us(ts) - epoch_us(pts) <= 7200000000
      ),
      c AS (SELECT user_id, ts, s FROM d WHERE ps IS NULL OR s <> ps),
      e AS (
        SELECT user_id, s,
          lag(s) OVER (PARTITION BY user_id ORDER BY ts) AS ps
        FROM c
      ),
      sc AS (
        SELECT user_id,
          CAST(count(*) FILTER (WHERE s = 2 AND ps = 1) AS INT) AS n_matches
        FROM e GROUP BY user_id
      ),
      rt AS (
        SELECT user_id,
          max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS a1,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a2,
          max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS a3
        FROM events WHERE event_type IN ('signup', 'purchase', 'error')
        GROUP BY user_id
      )
      SELECT rt.user_id,
        CAST(CASE WHEN rt.user_id IN (SELECT user_id FROM sm) THEN 1
                  ELSE 0 END AS INT) AS matched,
        coalesce(sc.n_matches, 0) AS n_matches,
        array_to_string([rt.a1,
         CASE WHEN rt.a1 = 1 AND rt.a2 = 1 THEN 1 ELSE 0 END,
         CASE WHEN rt.a1 = 1 AND rt.a3 = 1 THEN 1 ELSE 0 END], ',') AS r
      FROM rt LEFT JOIN sc ON sc.user_id = rt.user_id
      ORDER BY rt.user_id""")),

    // ---- ClickHouse aggregate combinators + parametric aggregates ------
    // (the -If family, argMax/argMin, uniqExact — ClickHouse "Aggregate
    // function combinators"; every alias maps onto a codegen'd Spark
    // aggregate so partial aggregation map-side-combines as usual.)

    QueryDef("q154_agg_combinators", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          countIf(value > 10.0) AS n_high,
          round(sumIf(value, user_id % 2 = 0), 6) AS sum_even,
          round(avgIf(value, value > 5.0), 6) AS avg_gt5,
          round(minIf(value, value > 1.0), 6) AS min_gt1,
          round(maxIf(value, user_id % 3 = 0), 6) AS max_u3,
          argMax(event_id, ts) AS last_eid,
          argMin(event_id, ts) AS first_eid,
          uniqExact(user_id) AS users
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      SELECT event_type,
        count(*) FILTER (WHERE value > 10.0) AS n_high,
        round(sum(value) FILTER (WHERE user_id % 2 = 0), 6) AS sum_even,
        round(avg(value) FILTER (WHERE value > 5.0), 6) AS avg_gt5,
        round(min(value) FILTER (WHERE value > 1.0), 6) AS min_gt1,
        round(max(value) FILTER (WHERE user_id % 3 = 0), 6) AS max_u3,
        arg_max(event_id, ts) AS last_eid,
        arg_min(event_id, ts) AS first_eid,
        count(DISTINCT user_id) AS users
      FROM events GROUP BY event_type ORDER BY event_type""")),

    QueryDef("q155_quantiles", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          round(quantileExact(value, 0.25), 6) AS p25,
          round(medianExact(value), 6) AS p50,
          round(quantileExact(value, 0.9), 6) AS p90,
          round(quantileExact(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      SELECT event_type,
        round(quantile_cont(value, 0.25), 6) AS p25,
        round(quantile_cont(value, 0.5), 6) AS p50,
        round(quantile_cont(value, 0.9), 6) AS p90,
        round(quantile_cont(value, 0.99), 6) AS p99
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- ClickHouse date/time dialect over the event stream ------------
    // `dd30` is the ClickHouse dateDiff('day', ts, ts+30h) BOUNDARY-
    // crossing count (1 or 2 depending on time of day), expressed through
    // the documented trunc identity (Registry note): Spark's native
    // timestampdiff over unit-truncated endpoints ≡ ClickHouse/DuckDB
    // dateDiff — the oracle side uses DuckDB's native boundary-counting
    // date_diff directly, so the identity itself is what's being gated.
    QueryDef("q157_datetime_dialect", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          toStartOfHour(ts) AS h,
          toStartOfDay(ts) AS d,
          toYYYYMM(ts) AS ym,
          toDayOfWeek(ts) AS dow,
          toHour(ts) AS hr,
          toUnixTimestamp(ts) AS ut,
          addDays(ts, 3) AS plus3d,
          subtractHours(ts, 7) AS minus7h,
          timestampdiff(DAY, toStartOfDay(ts),
                        toStartOfDay(addHours(ts, 30))) AS dd30
        FROM events WHERE event_id % 97 = 0 ORDER BY event_id""")
    }, Some("""
      SELECT event_id,
        date_trunc('hour', ts) AS h,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
        CAST(year(ts) * 100 + month(ts) AS INT) AS ym,
        CAST(isodow(ts) AS INT) AS dow,
        CAST(hour(ts) AS INT) AS hr,
        CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ut,
        ts + INTERVAL 3 DAY AS plus3d,
        ts - INTERVAL 7 HOUR AS minus7h,
        CAST(date_diff('day', ts, ts + INTERVAL 30 HOUR) AS BIGINT) AS dd30
      FROM events WHERE event_id % 97 = 0 ORDER BY event_id""")),

    // ---- sumMap: the ClickHouse metrics-pipeline aggregate --------------
    // ONE TypedImperativeAggregate (key→sum tree buffer, merged pairwise)
    // where plain SQL needs explode → groupBy(cohort, key) → re-collect —
    // two shuffles and an exploded row blow-up (the oracle below IS that
    // plan, written as UNION ALL + list()). Per-row map: the event's own
    // type plus a rolled-up 'all' slot.
    // Array/map outputs are serialized to '|'-joined strings in the FINAL
    // projection (both engines) so the driver's oracle harness can sort +
    // hash them — the repo's q32 convention; kernels/semantics unchanged.
    // Doubles go through round(v*1e6)→BIGINT micro-units: both engines
    // round the identical double, ties-away-from-zero on both.
    QueryDef("q158_summap", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT cohort,
          array_join(sm.keys, '|') AS keys,
          array_join(transform(sm.values,
            v -> CAST(CAST(round(v * 1000000) AS BIGINT) AS STRING)), '|') AS vals
        FROM (
          SELECT user_id % 10 AS cohort,
            sumMap(array(event_type, 'all'), array(value, value)) AS sm
          FROM events GROUP BY user_id % 10)
        ORDER BY cohort""")
    }, Some("""
      WITH per AS (
        SELECT user_id % 10 AS cohort, event_type AS k, sum(value) AS s
        FROM events GROUP BY 1, 2
        UNION ALL
        SELECT user_id % 10 AS cohort, 'all' AS k, sum(value) AS s
        FROM events GROUP BY 1
      )
      SELECT cohort,
        array_to_string(list(k ORDER BY k), '|') AS keys,
        array_to_string(list(CAST(round(s * 1000000) AS BIGINT) ORDER BY k), '|') AS vals
      FROM per GROUP BY cohort ORDER BY cohort""")),

    // topK: ClickHouse's approximate heavy-hitters API served EXACTLY
    // (hash-map buffer; deterministic count-desc/value-asc order lets the
    // oracle pin it — the oracle IS the two-shuffle groupBy+rank plan the
    // single-shuffle aggregate replaces)
    QueryDef("q163_topk", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT cohort, array_join(topK(event_type, 3), '|') AS top_types,
               array_join(transform(topK(bucket, 4),
                 x -> CAST(x AS STRING)), '|') AS top_buckets
        FROM (SELECT user_id % 10 AS cohort, event_type,
                     user_id % 7 AS bucket FROM events)
        GROUP BY cohort ORDER BY cohort""")
    }, Some("""
      WITH base AS (
        SELECT user_id % 10 AS cohort, event_type, user_id % 7 AS bucket
        FROM events
      ),
      ct AS (SELECT cohort, event_type AS v, count(*) AS n
             FROM base GROUP BY 1, 2),
      rt AS (SELECT cohort, v,
               row_number() OVER (PARTITION BY cohort ORDER BY n DESC, v) AS rn
             FROM ct),
      cb AS (SELECT cohort, bucket AS v, count(*) AS n
             FROM base GROUP BY 1, 2),
      rb AS (SELECT cohort, v,
               row_number() OVER (PARTITION BY cohort ORDER BY n DESC, v) AS rn
             FROM cb),
      tt AS (SELECT cohort, array_to_string(list(v ORDER BY rn), '|') AS top_types
             FROM rt WHERE rn <= 3 GROUP BY cohort),
      tb AS (SELECT cohort, array_to_string(list(CAST(v AS BIGINT) ORDER BY rn), '|') AS top_buckets
             FROM rb WHERE rn <= 4 GROUP BY cohort)
      SELECT tt.cohort, tt.top_types, tb.top_buckets
      FROM tt JOIN tb ON tb.cohort = tt.cohort
      ORDER BY tt.cohort""")),

    // ---- ClickHouse SELECT-clause extensions ----------------------------
    // LIMIT n BY col: top-2 purchases by value per event type, total
    // order via the (value DESC, event_id) tiebreaker
    QueryDef("q164_limit_by", (s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.SelectDialect.limitBy(
        ev.select(col("event_type"), col("event_id"), col("value")),
        n = 2, by = Seq(col("event_type")),
        order = Seq(col("value").desc, col("event_id").asc))
        .orderBy(col("event_type"), col("value").desc, col("event_id"))
    }, Some("""
      SELECT event_type, event_id, value FROM events
      QUALIFY row_number() OVER (PARTITION BY event_type
                                 ORDER BY value DESC, event_id) <= 2
      ORDER BY event_type, value DESC, event_id""")),

    // ORDER BY ... WITH FILL: daily high-value purchase counts densified
    // over the frame's own [min, max] day range (gaps exist at sf0.01:
    // 12 observed days over a 27-day span)
    QueryDef("q165_with_fill", (s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 250)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      graft.operators.SelectDialect.withFill(daily, "d",
        expr("INTERVAL 1 DAY"), fill = Map("n" -> lit(0L)))
    }, Some("""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, count(*) AS n
        FROM events WHERE event_type = 'purchase' AND value > 250
        GROUP BY 1
      ),
      spine AS (
        SELECT unnest(generate_series((SELECT min(d) FROM daily),
                                      (SELECT max(d) FROM daily),
                                      INTERVAL 1 DAY)) AS d
      )
      SELECT spine.d, coalesce(daily.n, 0) AS n
      FROM spine LEFT JOIN daily ON daily.d = spine.d
      ORDER BY spine.d""")),

    // ---- ClickHouse string-function dialect -----------------------------
    // (divergences pinned in the oracle: DuckDB regexp_extract yields
    // NULL on no-match where ClickHouse/Spark yield '' — coalesced;
    // integer division made explicit in countSubstrings.)
    QueryDef("q166_string_dialect", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT doc_id,
          position(text, 'the') AS pos,
          positionCaseInsensitive(text, 'THE') AS posci,
          replaceOne(text, 'the', '###') AS r1,
          replaceAll(text, 'the', '#') AS ra,
          replaceRegexpAll(text, '[aeiou]', '*') AS rre,
          match(text, '[0-9]') AS has_digit,
          extract(text, '([A-Za-z]+)ing') AS ing,
          array_join(extractAll(text, '([A-Za-z]+)ed'), '|') AS eds,
          countSubstrings(text, 'a') AS n_a,
          countMatches(text, '[0-9]+') AS n_num,
          multiSearchAny(text, array('data', 'xyzzy')) AS ms,
          trimBoth(leftPad(substring(text, 1, 8), 12, ' ')) AS padtrim,
          rightPad(upperUTF8(substring(text, 1, 4)), 6, '.') AS pad4,
          lengthUTF8(text) AS chars
        FROM documents ORDER BY doc_id""")
    }, Some("""
      SELECT doc_id,
        CAST(instr(text, 'the') AS INT) AS pos,
        CAST(instr(lower(text), 'the') AS INT) AS posci,
        CASE WHEN instr(text, 'the') = 0 THEN text
             ELSE substr(text, 1, instr(text, 'the') - 1) || '###' ||
                  substr(text, instr(text, 'the') + 3) END AS r1,
        replace(text, 'the', '#') AS ra,
        regexp_replace(text, '[aeiou]', '*', 'g') AS rre,
        regexp_matches(text, '[0-9]') AS has_digit,
        coalesce(regexp_extract(text, '([A-Za-z]+)ing', 1), '') AS ing,
        coalesce(array_to_string(regexp_extract_all(text, '([A-Za-z]+)ed', 1), '|'), '') AS eds,
        CAST(length(text) - length(replace(text, 'a', '')) AS INT) AS n_a,
        CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_num,
        (contains(text, 'data') OR contains(text, 'xyzzy')) AS ms,
        trim(lpad(substr(text, 1, 8), 12, ' ')) AS padtrim,
        rpad(upper(substr(text, 1, 4)), 6, '.') AS pad4,
        CAST(length(text) AS INT) AS chars
      FROM documents ORDER BY doc_id""")),

    // ---- ClickHouse array HOFs (lambda-first) + difference/cumsum -------
    QueryDef("q167_array_hof", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT doc_id,
          arrayExists(w -> length(w) > 8, splitByChar(' ', text)) AS has_long,
          arrayAll(w -> length(w) > 0, splitByChar(' ', text)) AS all_nonempty,
          arrayCount(w -> length(w) = 3, splitByChar(' ', text)) AS n3,
          arrayFirst(w -> length(w) > 5, splitByChar(' ', text)) AS first_long,
          arrayFirstIndex(w -> length(w) > 5, splitByChar(' ', text)) AS idx_long,
          arrayUniq(splitByChar(' ', text)) AS uniq_words,
          array_join(arraySort(arrayIntersect(splitByChar(' ', text),
                     array('the', 'of', 'and', 'data'))), '|') AS stops,
          array_join(transform(arrayDifference(arrayMap(w -> length(w),
                       arraySlice(splitByChar(' ', text), 1, 5))),
                     x -> CAST(CAST(x AS BIGINT) AS STRING)), '|') AS diffs,
          array_join(transform(arrayCumSum(arrayMap(w -> length(w),
                       arraySlice(splitByChar(' ', text), 1, 5))),
                     x -> CAST(CAST(x AS BIGINT) AS STRING)), '|') AS cum
        FROM documents ORDER BY doc_id""")
    }, Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
                        list_transform(list_slice(string_split(text, ' '), 1, 5),
                                       x -> length(x)) AS l5
                 FROM documents)
      SELECT doc_id,
        len(list_filter(w, x -> length(x) > 8)) > 0 AS has_long,
        len(list_filter(w, x -> length(x) > 0)) = len(w) AS all_nonempty,
        CAST(len(list_filter(w, x -> length(x) = 3)) AS INT) AS n3,
        list_filter(w, x -> length(x) > 5)[1] AS first_long,
        CAST(coalesce(list_filter(list_transform(w, (x, i) -> i),
               i -> length(w[i]) > 5)[1], 0) AS INT) AS idx_long,
        CAST(len(list_distinct(w)) AS INT) AS uniq_words,
        coalesce(array_to_string(list_sort(list_intersect(w, ['the', 'of', 'and', 'data'])), '|'), '') AS stops,
        array_to_string(list_transform(l5, (x, i) -> CASE WHEN i = 1 THEN 0
                        ELSE CAST(x - l5[i - 1] AS BIGINT) END), '|') AS diffs,
        array_to_string(list_transform(l5, (x, i) ->
                        CAST(list_sum(l5[1:i]) AS BIGINT)), '|') AS cum
      FROM t ORDER BY doc_id""")),

    // ---- ClickHouse array-function dialect over document tokens ---------
    // (arrayDistinct keeps first-occurrence order in BOTH ClickHouse and
    // Spark but DuckDB's list_distinct does not guarantee order — the
    // distinct leg is order-normalized through arraySort on both sides;
    // every other leg is order-exact. indexOf: DuckDB list_position
    // returns NULL where ClickHouse/Spark return 0 — coalesced.)
    QueryDef("q159_array_dialect", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT doc_id,
          arrayStringConcat(arraySort(arrayDistinct(splitByChar(' ', text))), '|') AS vocab,
          array_join(arraySlice(splitByChar(' ', text), 2, 3), '|') AS mid3,
          array_join(arrayReverse(arraySlice(splitByChar(' ', text), 1, 4)), '|') AS rev4,
          CAST(arraySum(arrayMap(w -> length(w), splitByChar(' ', text))) AS BIGINT) AS chars,
          round(arrayAvg(arrayMap(w -> length(w), splitByChar(' ', text))), 6) AS avg_len,
          indexOf(splitByChar(' ', text), 'the') AS pos_the,
          countEqual(splitByChar(' ', text), 'the') AS n_the,
          array_join(transform(arrayCompact(arrayMap(w -> length(w) % 3,
            arraySlice(splitByChar(' ', text), 1, 8))), x -> CAST(x AS STRING)), '|') AS compacted,
          array_join(arrayPushBack(arrayPushFront(
            arraySlice(splitByChar(' ', text), 1, 2), '<s>'), '</s>'), '|') AS framed,
          array_join(transform(arrayEnumerate(arraySlice(splitByChar(' ', text), 1, 3)),
            x -> CAST(x AS STRING)), '|') AS enum3,
          hasAll(splitByChar(' ', text), array('the', 'of')) AS has_the_of,
          hasAny(splitByChar(' ', text), array('xyzzy', 'the')) AS has_any,
          empty(splitByChar(' ', text)) AS is_empty
        FROM documents ORDER BY doc_id""")
    }, Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
        array_to_string(list_sort(list_distinct(w)), '|') AS vocab,
        coalesce(array_to_string(list_slice(w, 2, 4), '|'), '') AS mid3,
        coalesce(array_to_string(list_reverse(list_slice(w, 1, 4)), '|'), '') AS rev4,
        CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS chars,
        round(list_sum(list_transform(w, x -> CAST(length(x) AS DOUBLE))) / len(w), 6) AS avg_len,
        CAST(coalesce(list_position(w, 'the'), 0) AS INT) AS pos_the,
        CAST(len(list_filter(w, x -> x = 'the')) AS INT) AS n_the,
        array_to_string(
          list_filter(list_transform(list_slice(w, 1, 8), x -> CAST(length(x) % 3 AS INT)),
                      (x, i) -> i = 1 OR x <> list_transform(list_slice(w, 1, 8),
                                                             y -> CAST(length(y) % 3 AS INT))[i - 1]),
          '|') AS compacted,
        array_to_string(list_append(list_prepend('<s>', list_slice(w, 1, 2)), '</s>'), '|') AS framed,
        array_to_string(range(1, len(list_slice(w, 1, 3)) + 1), '|') AS enum3,
        list_has_all(w, ['the', 'of']) AS has_the_of,
        list_has_any(w, ['xyzzy', 'the']) AS has_any,
        len(w) = 0 AS is_empty
      FROM t ORDER BY doc_id"""))
  )
}
