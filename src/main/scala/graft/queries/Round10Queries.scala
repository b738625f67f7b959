package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.HashEmbedder
import graft.operators.{Bm25Index, GraphAnn}

/** Round-10 battery: the deterministic histogram family, the
  * moving-aggregate family under the explicit-sort-key contract, the
  * CSV format-family round-trip, and serving-tier TTL (SURVEY §14 items
  * 4/5/6/7).
  */
object Round10Queries {

  private val ttlVec = HashEmbedder.embed("retention aged serving probe")
  private val ttlLit = HashEmbedder.sqlArrayLiteral(ttlVec)

  /** Derived deterministic ingest timestamp: day (id % 30) of Jan 2024.
    * TTL cutoff 2024-01-15 expires offsets 0..13; survivors id%30 >= 14.
    */
  private def withIngestTs(df: org.apache.spark.sql.DataFrame,
      idCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("ingest_ts", expr(
      s"timestampadd(DAY, CAST($idCol % 30 AS INT), " +
        "timestamp'2024-01-01 00:00:00')"))

  def defs: Seq[QueryDef] = Seq(

    // ---- q183: exact fine-grid histogram (pass 2 of histogram(N)) -----
    // The bin expression is written identically on both engines, so the
    // IEEE double arithmetic — (v-lo)/(hi-lo)*G, floor, clamp — is
    // bit-identical and the counts hash-gate. min/max are exact picks.
    QueryDef("q183_histogram_fine", (s, dir) => {
      val ev = Tables.events(s, dir)
      val st = ev.agg(min(col("value").cast("double")).as("lo"),
        max(col("value").cast("double")).as("hi")).collect()(0)
      graft.operators.Hist
        .fineCounts(ev, "value", st.getDouble(0), st.getDouble(1), 512)
        .orderBy("bin")
    }, Some("""
      WITH st AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
      SELECT CAST(least(floor(((value - lo) / (hi - lo)) * 512), 511) AS INT) AS bin,
             count(*) AS cnt
      FROM events, st GROUP BY 1 ORDER BY 1""")),

    // ---- q184: adaptive histogram(16) — invariant gate ----------------
    // The adaptive merge itself is not SQL-expressible; the oracle pins
    // its exact invariants instead (HistSpec pins the bins themselves):
    // exactly N bins, heights sum to the row count, outer bounds are the
    // exact min/max, bins contiguous and strictly increasing.
    QueryDef("q184_histogram_adaptive", (s, dir) => {
      import s.implicits._
      val bs = graft.operators.Hist.bins(Tables.events(s, dir), "value", 16)
      val contiguous = bs.size >= 2 &&
        bs.sliding(2).forall(p => p(0).upper == p(1).lower)
      val increasing = bs.forall(b => b.upper > b.lower)
      Seq((bs.length, math.round(bs.map(_.height).sum),
        math.round(bs.head.lower * 1000000), math.round(bs.last.upper * 1000000),
        contiguous && increasing))
        .toDF("n_bins", "total", "lo", "hi", "ok")
    }, Some("""
      SELECT 16 AS n_bins, count(*) AS total,
        CAST(round(min(value) * 1000000) AS BIGINT) AS lo,
        CAST(round(max(value) * 1000000) AS BIGINT) AS hi,
        true AS ok
      FROM events""")),

    // ---- q185: groupArrayMovingSum/Avg (ts-sorted contract) -----------
    // Values pre-rounded to BIGINT so every windowed sum is exact in
    // double on both engines (≤2^53) — the gate is then immune to fp
    // association, like the funnel family. Oracle = the window-function
    // closed form the single-shuffle aggregate displaces.
    QueryDef("q185_moving_aggs", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT user_id,
          array_join(transform(
            groupArrayMovingSum(event_id, CAST(round(value) AS BIGINT), 3),
            x -> CAST(CAST(x AS BIGINT) AS STRING)), '|') AS ms3,
          array_join(transform(
            groupArrayMovingAvg(event_id, CAST(round(value) AS BIGINT)),
            x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS STRING)), '|') AS cma
        FROM events GROUP BY user_id ORDER BY user_id""")
    }, Some("""
      WITH w AS (
        SELECT user_id, event_id,
          sum(CAST(round(value) AS BIGINT)) OVER (PARTITION BY user_id
            ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms,
          avg(CAST(round(value) AS BIGINT)) OVER (PARTITION BY user_id
            ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ma
        FROM events)
      SELECT user_id,
        array_to_string(list(CAST(ms AS BIGINT) ORDER BY event_id), '|') AS ms3,
        array_to_string(list(CAST(round(ma * 1000000) AS BIGINT)
                             ORDER BY event_id), '|') AS cma
      FROM w GROUP BY user_id ORDER BY user_id""")),

    // ---- q193: deltaSum (sorted contract; integral-exact) --------------
    QueryDef("q193_deltasum", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT user_id,
          CAST(deltaSum(event_id, CAST(round(value) AS BIGINT)) AS BIGINT) AS ds
        FROM events GROUP BY user_id ORDER BY user_id""")
    }, Some("""
      WITH d AS (
        SELECT user_id, CAST(round(value) AS BIGINT) AS v,
          lag(CAST(round(value) AS BIGINT)) OVER (PARTITION BY user_id
            ORDER BY event_id) AS pv
        FROM events)
      SELECT user_id,
        CAST(coalesce(sum(CASE WHEN pv IS NOT NULL AND v > pv
                               THEN v - pv ELSE 0 END), 0) AS BIGINT) AS ds
      FROM d GROUP BY user_id ORDER BY user_id""")),

    // ---- q186: CSVWithNames export → import round-trip ----------------
    // Spark writes the CSV parts; BOTH engines then read the same files
    // back (Spark via CsvFormat.read with declared schema, DuckDB via
    // read_csv), gating the export formatting AND the import parse.
    QueryDef("q186_csv_roundtrip", (s, dir) => {
      val out = graft.operators.AnnIndex.tmpRoot + "/csv_q186"
      graft.sources.CsvFormat.write(
        Tables.events(s, dir).select("event_id", "event_type", "value")
          .repartition(4),
        out, graft.sources.CsvFormat.CsvWithNames)
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      graft.sources.CsvFormat.read(s, schema, out)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 1000000).cast("long").as("v"))
        .orderBy("event_id")
    }, Some(s"""
      SELECT event_id, event_type,
             CAST(round(value * 1000000) AS BIGINT) AS v
      FROM read_csv('${graft.operators.AnnIndex.tmpRoot}/csv_q186/*.csv',
        header=true,
        columns={'event_id': 'BIGINT', 'event_type': 'VARCHAR',
                 'value': 'DOUBLE'})
      ORDER BY event_id""")),

    // ---- q187: serving-tier TTL on the lexical tier -------------------
    // applyTtl tombstones by pinned ingest_ts; purgeDeleted physically
    // removes the dead docs WITH the corpus-stats move (df/N/avgdl
    // re-derived over survivors) — so the oracle scores over ONLY the
    // surviving corpus, unlike q138 whose pre-compaction contract keeps
    // full-corpus stats. In-query requires pin the purge contract.
    QueryDef("q187_ttl_lexical_purge", (s, dir) => {
      val docs = withIngestTs(Tables.documents(s, dir), "doc_id")
      val ix = Bm25Index.build(docs, "doc_id", "text",
        metaCols = Seq("ingest_ts"))
      try {
        val expired = ix.applyTtl("ingest_ts", "2024-01-15 00:00:00")
        val purged = ix.purgeDeleted()
        try {
          require(purged.deletedCount == 0, "purge must clear tombstones")
          require(purged.docCount == ix.docCount - expired,
            s"purge must drop the $expired expired docs")
          purged.topKDF(s, Round7Queries.bmTerms, 20)
        } finally purged.unpersist()
      } finally ix.unpersist()
    }, Some {
      val tfCols = Round7Queries.bmTerms.zipWithIndex
        .map { case (t, i) => s"${Round7Queries.tokTfSql(t)} AS tf$i" }
        .mkString(", ")
      val dfCols = Round7Queries.bmTerms.indices
        .map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
        .mkString(", ")
      s"""
      WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS BIGINT) AS dl,
               $tfCols
        FROM documents
        WHERE doc_id % 30 >= 14
      ), stats AS (
        SELECT count(*) AS n, sum(dl) AS sdl, $dfCols,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM base
      )
      SELECT doc_id, dl, round(${Round7Queries.bmScore}, 6) AS bm25
      FROM base CROSS JOIN stats
      WHERE tf0 + tf1 + tf2 > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""
    }),

    // ---- q188: serving-tier TTL on the graph tier ---------------------
    // Same age-out on GraphAnn: tombstone by pinned ts, purge rebuilds
    // the per-partition graphs over survivors with zero tombstones; the
    // exact brute path over the purged blocks oracle-gates the result.
    QueryDef("q188_ttl_vector_purge", (s, dir) => {
      import s.implicits._
      val corpus = withIngestTs(Tables.embeddings(s, dir), "vec_id")
        .select(col("vec_id"), col("embedding"), col("ingest_ts"))
      val g = GraphAnn.build(corpus, "vec_id", "embedding",
        metaCols = Seq("ingest_ts"))
      try {
        val expired = g.applyTtl("ingest_ts", "2024-01-15 00:00:00")
        val purged = g.purgeDeleted()
        try {
          require(purged.deletedCount == 0, "purge must clear tombstones")
          require(purged.rows == g.rows - expired,
            s"purge must drop the $expired expired nodes")
          val (res, _) = purged.topKBatchBrute(Array(ttlVec), 10)
          res(0).toSeq.toDF("vec_id", "dist")
            .select(col("vec_id"), round(col("dist"), 6).as("dist"))
            .orderBy(col("dist"), col("vec_id"))
        } finally purged.unpersist()
      } finally g.unpersist()
    }, Some(s"""
      SELECT vec_id,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($ttlLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE vec_id % 30 >= 14
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($ttlLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- q189: ClickHouse JSON-function family -------------------------
    // Over the real props column plus a nested document BOTH engines
    // construct identically (no whitespace, so raw fragments compare
    // byte-equal against DuckDB's normalized json_extract output).
    QueryDef("q189_json_dialect", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        WITH j AS (
          SELECT event_id, props,
            concat('{"k":', CAST(user_id % 100 AS STRING),
                   ',"flag":', CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END,
                   ',"nested":{"f":', CAST(user_id % 7 AS STRING),
                   ',"s":"u', CAST(user_id % 10 AS STRING), '"}',
                   ',"arr":[1,', CAST(user_id % 5 AS STRING), ',9]}') AS doc
          FROM events)
        SELECT event_id,
          JSONExtractInt(props, 'k') AS k,
          JSONHas(props, 'k') AS has_k,
          JSONHas(props, 'missing') AS has_m,
          JSONExtractBool(doc, 'flag') AS flag,
          JSONExtractInt(doc, 'nested', 'f') AS nf,
          JSONExtractString(doc, 'nested', 's') AS ns,
          JSONLength(doc) AS obj_len,
          JSONLength(doc, 'arr') AS arr_len,
          array_join(JSONExtractKeys(doc), '|') AS keys,
          JSONExtractRaw(doc, 'nested') AS raw_nested,
          visitParamExtractInt(props, 'k') AS vp_k
        FROM j ORDER BY event_id""")
    }, Some("""
      WITH j AS (
        SELECT event_id, props,
          '{"k":' || CAST(user_id % 100 AS VARCHAR) ||
          ',"flag":' || CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END ||
          ',"nested":{"f":' || CAST(user_id % 7 AS VARCHAR) ||
          ',"s":"u' || CAST(user_id % 10 AS VARCHAR) || '"}' ||
          ',"arr":[1,' || CAST(user_id % 5 AS VARCHAR) || ',9]}' AS doc
        FROM events)
      SELECT event_id,
        CAST(props->>'$.k' AS BIGINT) AS k,
        props->>'$.k' IS NOT NULL AS has_k,
        props->>'$.missing' IS NOT NULL AS has_m,
        CAST(doc->>'$.flag' AS BOOLEAN) AS flag,
        CAST(doc->>'$.nested.f' AS BIGINT) AS nf,
        doc->>'$.nested.s' AS ns,
        CAST(len(json_keys(doc)) AS INT) AS obj_len,
        CAST(json_array_length(doc, '$.arr') AS INT) AS arr_len,
        array_to_string(json_keys(doc), '|') AS keys,
        CAST(json_extract(doc, '$.nested') AS VARCHAR) AS raw_nested,
        CAST(props->>'$.k' AS BIGINT) AS vp_k
      FROM j ORDER BY event_id""")),

    // ---- q190: ClickHouse date/time-function family --------------------
    QueryDef("q190_datetime_dialect", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          toQuarter(ts) AS qtr,
          toStartOfQuarter(ts) AS soq,
          toStartOfYear(ts) AS soy,
          toMonday(ts) AS mon,
          toStartOfWeek(ts) AS sow,
          toISOWeek(ts) AS iw,
          toDayOfYear(ts) AS doy,
          toLastDayOfMonth(ts) AS ldm,
          toYYYYMMDD(ts) AS ymd,
          addMonths(ts, 1) AS am,
          subtractMinutes(ts, 90) AS sm,
          addSeconds(ts, 45) AS asec,
          toStartOfFifteenMinutes(ts) AS s15,
          timeSlot(ts) AS slot,
          toStartOfInterval(ts, 3600) AS s3600
        FROM events ORDER BY event_id""")
    }, Some("""
      SELECT event_id,
        CAST(quarter(ts) AS INT) AS qtr,
        CAST(date_trunc('quarter', ts) AS TIMESTAMP) AS soq,
        CAST(date_trunc('year', ts) AS TIMESTAMP) AS soy,
        CAST(date_trunc('week', ts) AS DATE) AS mon,
        CAST(date_trunc('week', ts + INTERVAL 1 DAY) AS DATE) - 1 AS sow,
        CAST(weekofyear(ts) AS INT) AS iw,
        CAST(dayofyear(ts) AS INT) AS doy,
        last_day(ts) AS ldm,
        CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT) AS ymd,
        ts + INTERVAL 1 MONTH AS am,
        ts - INTERVAL 90 MINUTE AS sm,
        ts + INTERVAL 45 SECOND AS asec,
        ts - to_microseconds(epoch_us(ts) % 900000000) AS s15,
        ts - to_microseconds(epoch_us(ts) % 1800000000) AS slot,
        ts - to_microseconds(epoch_us(ts) % 3600000000) AS s3600
      FROM events ORDER BY event_id""")),

    // ---- q191: ClickHouse URL-function family --------------------------
    // URLs constructed identically on both engines from documents.
    QueryDef("q191_url_dialect", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        WITH u AS (
          SELECT doc_id,
            concat('https://www.example', CAST(doc_id % 5 AS STRING),
                   '.org/kb/', source, '/', CAST(doc_id AS STRING),
                   '?lang=', lang, '&page=', CAST(doc_id % 7 AS STRING),
                   '#sec', CAST(doc_id % 3 AS STRING)) AS url
          FROM documents)
        SELECT doc_id,
          protocol(url) AS proto,
          domain(url) AS dom,
          domainWithoutWWW(url) AS dom_nw,
          topLevelDomain(url) AS tld,
          path(url) AS pth,
          pathFull(url) AS pthf,
          queryString(url) AS qs,
          fragment(url) AS frag,
          extractURLParameter(url, 'page') AS page,
          cutQueryString(url) AS cut_q,
          cutFragment(url) AS cut_f
        FROM u ORDER BY doc_id""")
    }, Some("""
      WITH u AS (
        SELECT doc_id,
          'https://www.example' || CAST(doc_id % 5 AS VARCHAR) ||
          '.org/kb/' || source || '/' || CAST(doc_id AS VARCHAR) ||
          '?lang=' || lang || '&page=' || CAST(doc_id % 7 AS VARCHAR) ||
          '#sec' || CAST(doc_id % 3 AS VARCHAR) AS url
        FROM documents)
      SELECT doc_id,
        regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1) AS proto,
        regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/@?#]*@)?([^/:?#]*)', 1) AS dom,
        regexp_replace(regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/@?#]*@)?([^/:?#]*)', 1), '^www\.', '') AS dom_nw,
        regexp_extract(regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/@?#]*@)?([^/:?#]*)', 1), '\.([^.]+)$', 1) AS tld,
        regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//[^/?#]*([^?#]*)', 1) AS pth,
        regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//[^/?#]*([^#]*)', 1) AS pthf,
        regexp_extract(url, '\?([^#]*)', 1) AS qs,
        regexp_extract(url, '#(.*)$', 1) AS frag,
        regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page,
        regexp_replace(url, '\?[^#]*', '') AS cut_q,
        regexp_replace(url, '#.*$', '') AS cut_f
      FROM u ORDER BY doc_id""")),

    // ---- q192: multiIf / integer arithmetic / conversions --------------
    // (toInt64 truncates toward zero like CH; DuckDB CAST(double AS
    // BIGINT) ROUNDS — the oracle trunc()s first to pin the divergence.)
    QueryDef("q192_misc_fns", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          multiIf(value < 100, 'low', value < 300, 'mid', 'high') AS band,
          intDiv(user_id - 75, 7) AS fdiv,
          intDivOrZero(user_id, user_id % 5) AS divz,
          moduloOrZero(user_id, user_id % 5) AS modz,
          toInt64(value) AS vi,
          toInt32(user_id % 100) AS ui,
          toFloat64(user_id) AS uf,
          toString(user_id) AS us
        FROM events ORDER BY event_id""")
    }, Some("""
      SELECT event_id,
        CASE WHEN value < 100 THEN 'low'
             WHEN value < 300 THEN 'mid' ELSE 'high' END AS band,
        CAST(floor(CAST(user_id - 75 AS DOUBLE) / 7) AS BIGINT) AS fdiv,
        CASE WHEN user_id % 5 = 0 THEN 0
             ELSE CAST(floor(CAST(user_id AS DOUBLE) / (user_id % 5)) AS BIGINT)
             END AS divz,
        CASE WHEN user_id % 5 = 0 THEN 0 ELSE user_id % (user_id % 5) END AS modz,
        CAST(trunc(value) AS BIGINT) AS vi,
        CAST(user_id % 100 AS INT) AS ui,
        CAST(user_id AS DOUBLE) AS uf,
        CAST(user_id AS VARCHAR) AS us
      FROM events ORDER BY event_id""")),

    // ---- q194: bitmap audience segmentation -----------------------------
    // One shuffle builds a roaring bitmap of user ids per event type
    // (state O(distinct users), never O(events)); every pairwise overlap
    // then comes from in-memory set algebra on the tiny state table — the
    // plan a SQL user needs T² distinct-count joins for. At 100 TB the
    // states are KBs/MBs while the fact table is the 100 TB; the self-join
    // is over |event_type|² rows.
    QueryDef("q194_bitmap_segments", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        WITH st AS (SELECT event_type, groupBitmapState(user_id) AS bm
                    FROM events GROUP BY event_type)
        SELECT a.event_type AS t1, b.event_type AS t2,
               bitmapAndCardinality(a.bm, b.bm) AS n_both,
               bitmapOrCardinality(a.bm, b.bm) AS n_either,
               bitmapAndnotCardinality(a.bm, b.bm) AS n_only1,
               bitmapXorCardinality(a.bm, b.bm) AS n_sym
        FROM st a JOIN st b ON a.event_type < b.event_type
        ORDER BY t1, t2""")
    }, Some("""
      WITH ut AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
      c AS (SELECT t, count(*) AS n FROM ut GROUP BY t),
      p AS (SELECT c1.t AS t1, c2.t AS t2, c1.n AS n1, c2.n AS n2
            FROM c c1 JOIN c c2 ON c1.t < c2.t),
      j AS (SELECT x.t AS t1, y.t AS t2, count(*) AS b
            FROM ut x JOIN ut y ON x.u = y.u AND x.t < y.t GROUP BY 1, 2)
      SELECT p.t1, p.t2,
             CAST(coalesce(j.b, 0) AS BIGINT) AS n_both,
             CAST(p.n1 + p.n2 - coalesce(j.b, 0) AS BIGINT) AS n_either,
             CAST(p.n1 - coalesce(j.b, 0) AS BIGINT) AS n_only1,
             CAST(p.n1 + p.n2 - 2 * coalesce(j.b, 0) AS BIGINT) AS n_sym
      FROM p LEFT JOIN j ON j.t1 = p.t1 AND j.t2 = p.t2
      ORDER BY p.t1, p.t2""")),

    // ---- q195: bitmap retention curve ----------------------------------
    // Day-0 cohort ∩ each later day, entirely on per-day bitmap states —
    // the groupBitmapAnd/retention idiom. The exact alternative re-scans
    // the fact table once per day measured.
    QueryDef("q195_bitmap_retention", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        WITH d AS (SELECT CAST(ts AS DATE) AS day,
                          groupBitmapState(user_id) AS bm
                   FROM events GROUP BY 1),
        d0 AS (SELECT bm AS bm0 FROM d
               WHERE day = (SELECT min(day) FROM d))
        SELECT day,
               bitmapAndCardinality(bm, bm0) AS retained,
               bitmapCardinality(bm) AS active
        FROM d CROSS JOIN d0 ORDER BY day""")
    }, Some("""
      WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
                  FROM events),
      c0 AS (SELECT u FROM du WHERE day = (SELECT min(day) FROM du))
      SELECT du.day,
             CAST(count(DISTINCT c0.u) AS BIGINT) AS retained,
             CAST(count(DISTINCT du.u) AS BIGINT) AS active
      FROM du LEFT JOIN c0 ON du.u = c0.u
      GROUP BY du.day ORDER BY du.day""")),

    // ---- q196: quantileTDigest rank-band gate ---------------------------
    // The t-digest estimate is merge-order-sensitive (every t-digest is),
    // so the hashable outputs are the EXACT quantiles; the sketch is gated
    // by an in-query assertion that each estimate lands inside the ±0.02
    // rank band of the exact distribution — an order of magnitude looser
    // than δ=200's worst-case rank error, hence deterministic under any
    // partitioning (the uniq/dispatch-assert convention).
    QueryDef("q196_quantile_tdigest", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          round(quantileExact(value, 0.5), 6) AS p50,
          round(quantileExact(value, 0.95), 6) AS p95,
          (quantileTDigest(value, 0.5)
             BETWEEN quantileExact(value, 0.48) AND quantileExact(value, 0.52))
          AND (quantileTDigest(value, 0.95)
             BETWEEN quantileExact(value, 0.93) AND quantileExact(value, 0.97))
          AS td_ok
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      SELECT event_type,
        round(quantile_cont(value, 0.5), 6) AS p50,
        round(quantile_cont(value, 0.95), 6) AS p95,
        true AS td_ok
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- q197: geo dialect --------------------------------------------
    // Deterministic lon/lat derived from ids (0.1-degree grid — both
    // engines compute the identical integer division, so the input
    // doubles are bit-identical). Distance gates at whole meters: the
    // only cross-engine drift is libm-vs-Java sin/cos ulps (~1e-8 m at
    // 1e7 m), eight orders below the gate. pointInPolygon runs on a
    // diamond whose SQL closed form (|x|+|y| <= 5, boundary inside)
    // matches the ray-caster's documented boundary rule exactly on
    // integral coordinates. Geohash has no DuckDB spelling, so its legs
    // are in-query assertions (the q196 convention): decode(encode(p))
    // lands within the cell's half-extent, and precision-5 is a prefix
    // of precision-7 (GeoSpec pins public test vectors).
    QueryDef("q197_geo_dialect", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          CAST(round(greatCircleDistance(
            CAST(event_id % 3600 AS DOUBLE) / 10 - 180,
            CAST(user_id % 1700 AS DOUBLE) / 10 - 85,
            2.3522, 48.8566)) AS BIGINT) AS dist_m,
          pointInPolygon(
            CAST(event_id % 11 - 5 AS DOUBLE), CAST(user_id % 11 - 5 AS DOUBLE),
            array(0D, 5D, 0D, -5D), array(5D, 0D, -5D, 0D)) AS in_poly,
          (abs(geohashDecode(geohashEncode(
              CAST(event_id % 3600 AS DOUBLE) / 10 - 180,
              CAST(user_id % 1700 AS DOUBLE) / 10 - 85, 7)).longitude
            - (CAST(event_id % 3600 AS DOUBLE) / 10 - 180)) <= 180.0 / pow(2, 18) + 1e-9
           AND abs(geohashDecode(geohashEncode(
              CAST(event_id % 3600 AS DOUBLE) / 10 - 180,
              CAST(user_id % 1700 AS DOUBLE) / 10 - 85, 7)).latitude
            - (CAST(user_id % 1700 AS DOUBLE) / 10 - 85)) <= 90.0 / pow(2, 17) + 1e-9
           AND startswith(
             geohashEncode(CAST(event_id % 3600 AS DOUBLE) / 10 - 180,
               CAST(user_id % 1700 AS DOUBLE) / 10 - 85, 7),
             geohashEncode(CAST(event_id % 3600 AS DOUBLE) / 10 - 180,
               CAST(user_id % 1700 AS DOUBLE) / 10 - 85, 5))) AS gh_ok
        FROM events ORDER BY event_id""")
    }, Some("""
      SELECT event_id,
        CAST(round(2 * 6371008.8 * asin(least(1.0, sqrt(
          pow(sin(radians(48.8566 - (CAST(user_id % 1700 AS DOUBLE) / 10 - 85)) / 2), 2)
          + cos(radians(CAST(user_id % 1700 AS DOUBLE) / 10 - 85)) * cos(radians(48.8566))
            * pow(sin(radians(2.3522 - (CAST(event_id % 3600 AS DOUBLE) / 10 - 180)) / 2), 2)
        )))) AS BIGINT) AS dist_m,
        (abs(event_id % 11 - 5) + abs(user_id % 11 - 5)) <= 5 AS in_poly,
        true AS gh_ok
      FROM events ORDER BY event_id""")),

    // ---- q198: entropy ------------------------------------------------
    // Shannon entropy per event type over two key types (bigint buckets,
    // string pages). The Spark side sums in sorted-key order so the
    // double is partitioning-exact; DuckDB's own entropy() aggregate is
    // the oracle, rounded at 1e-6 (cross-engine libm drift ~1e-15).
    QueryDef("q198_entropy", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          round(entropy(user_id % 16), 6) AS h_bucket,
          round(entropy(concat('b', CAST(user_id % 8 AS STRING))), 6) AS h_page,
          round(entropy(CAST(user_id % 1 AS INT)), 6) AS h_const
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      SELECT event_type,
        round(entropy(user_id % 16), 6) AS h_bucket,
        round(entropy(concat('b', CAST(user_id % 8 AS VARCHAR))), 6) AS h_page,
        round(entropy(user_id % 1), 6) AS h_const
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- q199: statistical moments + regression -----------------------
    // CH naming onto Spark's stable central-moment kernels (skewPop =
    // m3/m2^1.5, kurtPop = m4/m2^2 — NOT excess; the *Samp forms are the
    // population value scaled by ((n-1)/n)^(k/2), CH's own definition).
    // The oracle recomputes from EXACT integer power sums (x is a small
    // int, so s1..s4 are exact in DuckDB's HUGEINT) — both engines land
    // within ~1e-10 of the true value and gate at 1e-6.
    QueryDef("q199_stats_dialect", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type, count(*) AS n,
          round(skewPop(user_id % 97), 6) AS skew_p,
          round(skewSamp(user_id % 97), 6) AS skew_s,
          round(kurtPop(user_id % 97), 6) AS kurt_p,
          round(kurtSamp(user_id % 97), 6) AS kurt_s,
          round(corr(CAST(user_id % 97 AS DOUBLE), value), 6) AS cxy,
          round(simpleLinearRegression(CAST(user_id % 97 AS DOUBLE), value).k, 6) AS k,
          round(simpleLinearRegression(CAST(user_id % 97 AS DOUBLE), value).b, 6) AS b
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH m AS (
        SELECT event_type, count(*) AS n,
               sum(user_id % 97) AS s1,
               sum((user_id % 97) * (user_id % 97)) AS s2,
               sum((user_id % 97) * (user_id % 97) * (user_id % 97)) AS s3,
               sum((user_id % 97) * (user_id % 97) * (user_id % 97) * (user_id % 97)) AS s4,
               corr(value, CAST(user_id % 97 AS DOUBLE)) AS cxy,
               regr_slope(value, CAST(user_id % 97 AS DOUBLE)) AS k,
               regr_intercept(value, CAST(user_id % 97 AS DOUBLE)) AS b
        FROM events GROUP BY event_type),
      c AS (
        SELECT *, CAST(s1 AS DOUBLE) / n AS mu FROM m),
      cm AS (
        SELECT *,
          CAST(s2 AS DOUBLE) / n - mu * mu AS m2,
          CAST(s3 AS DOUBLE) / n - 3 * mu * CAST(s2 AS DOUBLE) / n + 2 * mu * mu * mu AS m3,
          CAST(s4 AS DOUBLE) / n - 4 * mu * CAST(s3 AS DOUBLE) / n
            + 6 * mu * mu * CAST(s2 AS DOUBLE) / n - 3 * mu * mu * mu * mu AS m4
        FROM c)
      SELECT event_type, n,
        round(m3 / pow(m2, 1.5), 6) AS skew_p,
        round(m3 / pow(m2, 1.5) * pow((n - 1.0) / n, 1.5), 6) AS skew_s,
        round(m4 / (m2 * m2), 6) AS kurt_p,
        round(m4 / (m2 * m2) * pow((n - 1.0) / n, 2), 6) AS kurt_s,
        round(cxy, 6) AS cxy, round(k, 6) AS k, round(b, 6) AS b
      FROM cm ORDER BY event_type""")),

    // ---- q200: the -ForEach combinator family --------------------------
    // Position-wise aggregation over the embedding column, including a
    // RAGGED leg (slice length 1 + vec_id % 3) where short arrays simply
    // stop contributing — ClickHouse's rule. min/max/count are exact;
    // sums gate at 1e-4 units (distributed double sums drift ~1e-12,
    // eight orders below the grid), per-position means at micro-units —
    // all via floor(x*C + 0.5), pure IEEE ops both engines compute
    // bit-identically (Spark's round() goes through the shortest string
    // repr, which for float-origin data lands ON micro-boundaries).
    // Arrays serialize to '|' strings on both engines (the q158
    // convention); the DuckDB oracle is the zipped-unnest closed form.
    QueryDef("q200_foreach", (s, dir) => {
      s.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("emb")
      s.sql("""
        SELECT vec_id % 4 AS g,
          array_join(transform(sumForEach(embedding),
            v -> floor(v * 10000 + 0.5d)), '|') AS s4,
          array_join(transform(minForEach(embedding),
            v -> floor(v * 1000000 + 0.5d)), '|') AS mn6,
          array_join(transform(maxForEach(embedding),
            v -> floor(v * 1000000 + 0.5d)), '|') AS mx6,
          array_join(transform(avgForEach(embedding),
            v -> floor(v * 1000000 + 0.5d)), '|') AS av6,
          array_join(transform(countForEach(slice(embedding, 1, CAST(1 + vec_id % 3 AS INT))),
            v -> CAST(v AS STRING)), '|') AS ragged_cnt,
          array_join(transform(sumForEach(slice(embedding, 1, CAST(1 + vec_id % 3 AS INT))),
            v -> floor(v * 10000 + 0.5d)), '|') AS ragged_s4
        FROM emb GROUP BY vec_id % 4 ORDER BY g""")
    }, Some("""
      WITH u0 AS (SELECT vec_id % 4 AS g,
                         unnest(range(len(embedding))) AS i,
                         unnest(embedding) AS e0
                  FROM embeddings),
      u AS (SELECT g, i, CAST(e0 AS DOUBLE) AS e FROM u0),
      p AS (SELECT g, i, sum(e) AS s, min(e) AS mn, max(e) AS mx,
                   avg(e) AS av, count(*) AS c
            FROM u GROUP BY g, i),
      r0 AS (SELECT vec_id % 4 AS g,
                    unnest(range(len(embedding[1 : CAST(1 + vec_id % 3 AS INT)]))) AS i,
                    unnest(embedding[1 : CAST(1 + vec_id % 3 AS INT)]) AS e0
             FROM embeddings),
      r AS (SELECT g, i, CAST(e0 AS DOUBLE) AS e FROM r0),
      rp AS (SELECT g, i, sum(e) AS s, count(*) AS c FROM r GROUP BY g, i),
      agg AS (
        SELECT g,
          string_agg(CAST(floor(s * 10000 + 0.5) AS BIGINT), '|' ORDER BY i) AS s4,
          string_agg(CAST(floor(mn * 1000000 + 0.5) AS BIGINT), '|' ORDER BY i) AS mn6,
          string_agg(CAST(floor(mx * 1000000 + 0.5) AS BIGINT), '|' ORDER BY i) AS mx6,
          string_agg(CAST(floor(av * 1000000 + 0.5) AS BIGINT), '|' ORDER BY i) AS av6
        FROM p GROUP BY g),
      ragg AS (
        SELECT g,
          string_agg(CAST(c AS VARCHAR), '|' ORDER BY i) AS ragged_cnt,
          string_agg(CAST(floor(s * 10000 + 0.5) AS BIGINT), '|' ORDER BY i) AS ragged_s4
        FROM rp GROUP BY g)
      SELECT agg.g, s4, mn6, mx6, av6, ragged_cnt, ragged_s4
      FROM agg JOIN ragg ON agg.g = ragg.g ORDER BY agg.g""")),

    // ---- q201: hypothesis tests + categorical association ---------------
    // t statistics gate exactly against DuckDB's avg/var_samp closed
    // forms; the p-values have no DuckDB spelling (regularized incomplete
    // beta), so they gate by in-query bands — the sketch convention —
    // while StatTestsSpec pins them to published t-table constants.
    // cramersV / theilsU / contingency gate exactly against pair-count
    // closed forms.
    QueryDef("q201_stat_tests", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          round(studentTTest(value, CAST(user_id % 2 AS INT)).t_stat, 6) AS t_student,
          round(welchTTest(value, CAST(user_id % 2 AS INT)).t_stat, 6) AS t_welch,
          round(meanZTest(value, CAST(user_id % 2 AS INT), 20000, 20000).z_stat, 6) AS z_mean,
          (studentTTest(value, CAST(user_id % 2 AS INT)).p_value BETWEEN 0 AND 1)
            AND (welchTTest(value, CAST(user_id % 2 AS INT)).p_value BETWEEN 0 AND 1)
            AND (meanZTest(value, CAST(user_id % 2 AS INT), 20000, 20000).p_value
                   BETWEEN 0 AND 1)
            AS p_ok,
          round(cramersV(CAST(user_id % 7 AS STRING), CAST(user_id % 3 AS STRING)), 6) AS cv,
          round(cramersVBiasCorrected(CAST(user_id % 7 AS STRING),
                                      CAST(user_id % 3 AS STRING)), 6) AS cvbc,
          round(theilsU(CAST(user_id % 6 AS STRING), CAST(user_id % 3 AS STRING)), 6) AS tu,
          round(contingency(CAST(user_id % 7 AS STRING), CAST(user_id % 3 AS STRING)), 6) AS cg
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH g AS (
        SELECT event_type, user_id % 2 AS s,
               count(*) AS n, avg(value) AS m, var_samp(value) AS v
        FROM events GROUP BY event_type, user_id % 2),
      t AS (
        SELECT a.event_type,
          (a.m - b.m) / sqrt(((a.n - 1) * a.v + (b.n - 1) * b.v)
            / (a.n + b.n - 2) * (1.0 / a.n + 1.0 / b.n)) AS t_student,
          (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) AS t_welch,
          (a.m - b.m) / sqrt(20000.0 / a.n + 20000.0 / b.n) AS z_mean
        FROM g a JOIN g b ON a.event_type = b.event_type AND a.s = 0 AND b.s = 1),
      pc AS (SELECT event_type, user_id % 7 AS x, user_id % 3 AS y, count(*) AS c
             FROM events GROUP BY 1, 2, 3),
      rm AS (SELECT event_type, x, sum(c) AS rc FROM pc GROUP BY 1, 2),
      cm AS (SELECT event_type, y, sum(c) AS cc FROM pc GROUP BY 1, 2),
      nn AS (SELECT event_type, count(*) AS n,
                    count(DISTINCT user_id % 7) AS r,
                    count(DISTINCT user_id % 3) AS cdim
             FROM events GROUP BY 1),
      chi AS (
        SELECT pc.event_type,
               nn.n * (sum(CAST(pc.c AS DOUBLE) * pc.c
                 / (rm.rc * CAST(cm.cc AS DOUBLE))) - 1.0) AS chi2,
               max(nn.n) AS n, max(nn.r) AS r, max(nn.cdim) AS cdim
        FROM pc JOIN rm ON pc.event_type = rm.event_type AND pc.x = rm.x
                JOIN cm ON pc.event_type = cm.event_type AND pc.y = cm.y
                JOIN nn ON pc.event_type = nn.event_type
        GROUP BY pc.event_type, nn.n),
      pu AS (SELECT event_type, user_id % 6 AS x, user_id % 3 AS y, count(*) AS c
             FROM events GROUP BY 1, 2, 3),
      pur AS (SELECT event_type, x, sum(c) AS rc FROM pu GROUP BY 1, 2),
      puc AS (SELECT event_type, y, sum(c) AS cc FROM pu GROUP BY 1, 2),
      pun AS (SELECT event_type, sum(c) AS n FROM pu GROUP BY 1),
      hx AS (SELECT pur.event_type,
                    -sum((rc / CAST(n AS DOUBLE)) * ln(rc / CAST(n AS DOUBLE))) AS h
             FROM pur JOIN pun ON pur.event_type = pun.event_type GROUP BY 1),
      hxy AS (SELECT pu.event_type,
                     -sum((puc.cc / CAST(pun.n AS DOUBLE))
                          * (pu.c / CAST(puc.cc AS DOUBLE))
                          * ln(pu.c / CAST(puc.cc AS DOUBLE))) AS h
              FROM pu JOIN puc ON pu.event_type = puc.event_type AND pu.y = puc.y
                      JOIN pun ON pu.event_type = pun.event_type
              GROUP BY 1)
      SELECT t.event_type,
        round(t.t_student, 6) AS t_student,
        round(t.t_welch, 6) AS t_welch,
        round(t.z_mean, 6) AS z_mean,
        true AS p_ok,
        round(sqrt(chi.chi2 / chi.n / least(chi.r - 1, chi.cdim - 1)), 6) AS cv,
        round(CASE WHEN greatest(0.0, chi.chi2 / chi.n
                     - (chi.r - 1.0) * (chi.cdim - 1.0) / (chi.n - 1.0)) = 0 THEN 0
              ELSE sqrt(greatest(0.0, chi.chi2 / chi.n
                     - (chi.r - 1.0) * (chi.cdim - 1.0) / (chi.n - 1.0))
                / least(chi.r - (chi.r - 1.0) * (chi.r - 1.0) / (chi.n - 1.0) - 1.0,
                        chi.cdim - (chi.cdim - 1.0) * (chi.cdim - 1.0) / (chi.n - 1.0) - 1.0))
              END, 6) AS cvbc,
        round((hx.h - hxy.h) / hx.h, 6) AS tu,
        round(sqrt(chi.chi2 / (chi.chi2 + chi.n)), 6) AS cg
      FROM t JOIN chi ON t.event_type = chi.event_type
             JOIN hx ON t.event_type = hx.event_type
             JOIN hxy ON t.event_type = hxy.event_type
      ORDER BY t.event_type""")),

    // ---- q202: EMA + LTTB over per-user series --------------------------
    // EMA gates exactly (rounded 1e-6) against its own telescoped closed
    // form — one SQL expression, the reason graft defines the aggregate
    // this way. LTTB has no SQL closed form; its legs gate the exact
    // invariants in-query (length, endpoints, membership via anti-join,
    // strict x order) while StatTestsSpec pins the point selection.
    QueryDef("q202_series_aggs", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        WITH lt AS (
          SELECT user_id, count(*) AS cnt,
                 largestTriangleThreeBuckets(event_id, value, 5) AS pts
          FROM events GROUP BY user_id),
        flat AS (SELECT user_id, explode(pts) AS p FROM lt),
        member AS (
          SELECT f.user_id, count(*) AS n_out,
                 sum(CASE WHEN e.event_id IS NULL THEN 1 ELSE 0 END) AS strays
          FROM flat f LEFT JOIN events e
            ON f.user_id = e.user_id AND CAST(f.p.x AS BIGINT) = e.event_id
               AND abs(f.p.y - e.value) < 1e-9
          GROUP BY f.user_id),
        ema AS (
          SELECT user_id,
                 round(exponentialMovingAverage(event_id, value, 500.0), 6) AS ema
          FROM events GROUP BY user_id)
        SELECT lt.user_id, ema.ema,
               least(5, lt.cnt) AS n_expect, member.n_out,
               (member.strays = 0
                AND element_at(lt.pts, 1).x = CAST(array_min(transform(lt.pts, q -> q.x)) AS DOUBLE)
                AND element_at(lt.pts, -1).x = CAST(array_max(transform(lt.pts, q -> q.x)) AS DOUBLE))
                 AS lttb_ok
        FROM lt JOIN member ON lt.user_id = member.user_id
                JOIN ema ON lt.user_id = ema.user_id
        ORDER BY lt.user_id""")
    }, Some("""
      WITH mk AS (SELECT user_id, max(event_id) AS kmax FROM events GROUP BY user_id),
      ema AS (
        SELECT e.user_id,
               sum(e.value * pow(2, (e.event_id - mk.kmax) / 500.0))
                 / sum(pow(2, (e.event_id - mk.kmax) / 500.0)) AS ema
        FROM events e JOIN mk ON e.user_id = mk.user_id
        GROUP BY e.user_id),
      c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
      SELECT c.user_id, round(ema.ema, 6) AS ema,
             least(5, c.cnt) AS n_expect, least(5, c.cnt) AS n_out,
             true AS lttb_ok
      FROM c JOIN ema ON c.user_id = ema.user_id
      ORDER BY c.user_id""")),

    // ---- q203: rank statistics ------------------------------------------
    // Spearman via average ranks (oracle: rank() + (ties-1)/2 then
    // Pearson), the KS D statistic via the cumulative-ECDF closed form,
    // and the Mann-Whitney U from rank sums — all exact in DuckDB SQL.
    // The two p-values ride the incomplete-beta/erfc machinery pinned in
    // RankIntervalSpec, banded in-query here.
    QueryDef("q203_rank_tests", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          round(rankCorr(CAST(user_id % 97 AS DOUBLE), value), 6) AS rho,
          round(kolmogorovSmirnovTest(value, CAST(user_id % 2 AS INT)).d_statistic, 6) AS ks_d,
          round(mannWhitneyUTest(value, CAST(user_id % 2 AS INT)).u_statistic, 6) AS mwu_u,
          (kolmogorovSmirnovTest(value, CAST(user_id % 2 AS INT)).p_value BETWEEN 0 AND 1
           AND mannWhitneyUTest(value, CAST(user_id % 2 AS INT)).p_value BETWEEN 0 AND 1)
            AS p_ok
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH rk AS (
        SELECT event_type,
          rank() OVER (PARTITION BY event_type ORDER BY user_id % 97)
            + (count(*) OVER (PARTITION BY event_type, user_id % 97) - 1) / 2.0 AS rx,
          rank() OVER (PARTITION BY event_type ORDER BY value)
            + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS ry
        FROM events),
      rho AS (SELECT event_type, corr(rx, ry) AS rho FROM rk GROUP BY 1),
      pts AS (
        SELECT event_type, value AS v,
               sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS c0,
               sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS c1
        FROM events GROUP BY 1, 2),
      tot AS (SELECT event_type, sum(c0) AS n0, sum(c1) AS n1 FROM pts GROUP BY 1),
      ecdf AS (
        SELECT p.event_type,
               abs(sum(p.c0) OVER (PARTITION BY p.event_type ORDER BY p.v)
                     / CAST(t.n0 AS DOUBLE)
                   - sum(p.c1) OVER (PARTITION BY p.event_type ORDER BY p.v)
                     / CAST(t.n1 AS DOUBLE)) AS gap
        FROM pts p JOIN tot t ON p.event_type = t.event_type),
      ks AS (SELECT event_type, max(gap) AS d FROM ecdf GROUP BY 1),
      mrk AS (
        SELECT event_type, user_id % 2 AS s,
          rank() OVER (PARTITION BY event_type ORDER BY value)
            + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS r
        FROM events),
      mwu AS (
        SELECT m.event_type,
               sum(CASE WHEN m.s = 0 THEN m.r ELSE 0 END)
                 - t.n0 * (t.n0 + 1) / 2.0 AS u
        FROM mrk m JOIN tot t ON m.event_type = t.event_type
        GROUP BY m.event_type, t.n0)
      SELECT rho.event_type, round(rho.rho, 6) AS rho,
             round(ks.d, 6) AS ks_d, round(mwu.u, 6) AS mwu_u, true AS p_ok
      FROM rho JOIN ks ON rho.event_type = ks.event_type
               JOIN mwu ON rho.event_type = mwu.event_type
      ORDER BY rho.event_type""")),

    // ---- q204: interval sweeps + mode + boundingRatio -------------------
    // Derived intervals [event_id % 1000, + user_id % 50 + 1) per event
    // type. The oracle rebuilds the sweep in SQL: +1/-1 events ordered by
    // (point, delta) — delta ascending puts the -1 end first, matching
    // the aggregate's end-exclusive rule; the union length comes from the
    // islands idiom over DISTINCT intervals (with duplicates, the two
    // window sorts can order tied rows differently and attach a gap to
    // the wrong island - caught as a 1-unit sf0.1 divergence). boundingRatio gates against arg_max/arg_min
    // (event_id is unique, the documented determinism contract).
    QueryDef("q204_intervals", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          maxIntersections(event_id % 1000, event_id % 1000 + user_id % 50 + 1) AS mi,
          maxIntersectionsPosition(event_id % 1000,
                                   event_id % 1000 + user_id % 50 + 1) AS mp,
          intervalLengthSum(event_id % 1000, event_id % 1000 + user_id % 50 + 1) AS il,
          round(boundingRatio(CAST(event_id AS DOUBLE), value), 6) AS br,
          modeExact(CAST(user_id % 100 AS INT)) AS md
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH iv AS (
        SELECT event_type, event_id % 1000 AS s,
               event_id % 1000 + user_id % 50 + 1 AS e
        FROM events),
      ev AS (
        SELECT event_type, s AS pt, 1 AS delta FROM iv
        UNION ALL
        SELECT event_type, e AS pt, -1 AS delta FROM iv),
      rs AS (
        SELECT event_type, pt, delta,
               sum(delta) OVER (PARTITION BY event_type
                 ORDER BY pt, delta
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
        FROM ev),
      mi AS (SELECT event_type, max(cur) AS mi FROM rs GROUP BY 1),
      mp AS (SELECT rs.event_type, min(rs.pt) AS mp
             FROM rs JOIN mi ON rs.event_type = mi.event_type
             WHERE rs.cur = mi.mi AND rs.delta = 1 GROUP BY 1),
      ivd AS (SELECT DISTINCT event_type, s, e FROM iv),
      isl AS (
        SELECT event_type, s, e,
          CASE WHEN s > coalesce(max(e) OVER (PARTITION BY event_type
                 ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), -9223372036854775808) THEN 1 ELSE 0 END AS brk
        FROM ivd),
      isl2 AS (
        SELECT event_type, s, e,
          sum(brk) OVER (PARTITION BY event_type ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl),
      il AS (
        SELECT event_type, sum(len) AS il FROM (
          SELECT event_type, island, max(e) - min(s) AS len
          FROM isl2 GROUP BY 1, 2) GROUP BY 1),
      br AS (
        SELECT event_type,
          (arg_max(value, event_id) - arg_min(value, event_id))
            / CAST(max(event_id) - min(event_id) AS DOUBLE) AS br
        FROM events GROUP BY 1),
      md AS (
        SELECT event_type, CAST(v AS INT) AS md FROM (
          SELECT event_type, user_id % 100 AS v, count(*) AS c,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY count(*) DESC, user_id % 100 ASC) AS rn
          FROM events GROUP BY event_type, user_id % 100)
        WHERE rn = 1)
      SELECT mi.event_type, CAST(mi.mi AS BIGINT) AS mi,
             CAST(mp.mp AS BIGINT) AS mp, CAST(il.il AS BIGINT) AS il,
             round(br.br, 6) AS br, md.md
      FROM mi JOIN mp ON mi.event_type = mp.event_type
              JOIN il ON mi.event_type = il.event_type
              JOIN br ON mi.event_type = br.event_type
              JOIN md ON mi.event_type = md.event_type
      ORDER BY mi.event_type""")),

    // ---- q205: fuzzy string matching ------------------------------------
    // Adjacent-doc pairs over 40-char prefixes. editDistance/damerau/
    // jaro/jaroWinkler/stringJaccardIndex gate exactly against DuckDB's
    // native levenshtein/damerau_levenshtein/jaro_similarity/
    // jaro_winkler_similarity/jaccard (same variants: true DL, 0.7 boost
    // threshold, character-set Jaccard — probed before wiring).
    // ngramDistance has no DuckDB native; its legs gate the metric
    // identities (d(s,s)=0, symmetry, [0,1]) with exact values pinned in
    // StringSimSpec.
    QueryDef("q205_fuzzy_match", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        WITH p AS (
          SELECT a.doc_id, substring(a.text, 1, 40) AS s1,
                 substring(b.text, 1, 40) AS s2
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1)
        SELECT doc_id,
          editDistance(s1, s2) AS lev,
          damerauLevenshteinDistance(s1, s2) AS dl,
          round(jaroSimilarity(s1, s2), 6) AS jaro,
          round(jaroWinklerSimilarity(s1, s2), 6) AS jw,
          round(stringJaccardIndex(s1, s2), 6) AS jac,
          (ngramDistance(s1, s2) BETWEEN 0 AND 1
           AND ngramDistance(s1, s2) = ngramDistance(s2, s1)
           AND ngramDistance(s1, s1) = 0.0D) AS ngram_ok
        FROM p ORDER BY doc_id""")
    }, Some("""
      WITH p AS (
        SELECT a.doc_id, substring(a.text, 1, 40) AS s1,
               substring(b.text, 1, 40) AS s2
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1)
      SELECT doc_id,
        levenshtein(s1, s2) AS lev,
        damerau_levenshtein(s1, s2) AS dl,
        round(jaro_similarity(s1, s2), 6) AS jaro,
        round(jaro_winkler_similarity(s1, s2), 6) AS jw,
        round(jaccard(s1, s2), 6) AS jac,
        true AS ngram_ok
      FROM p ORDER BY doc_id""")),

    // ---- q206: weighted stats, AUC, frame aliases -----------------------
    // quantileExactWeighted oracles via DuckDB quantile_disc over
    // unnest(range(w)) repeats (probed: quantile_disc = smallest v with
    // cum count >= q*n, exactly our type-1 rule). arrayAUC oracles via
    // the rank closed form the array never needs on the DuckDB side.
    // quantileGK gates by the exact-quantile rank band (sketch
    // convention).
    QueryDef("q206_weighted_stats", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          round(avgWeighted(value, CAST(user_id % 10 + 1 AS DOUBLE)), 6) AS aw,
          quantileExactWeighted(value, user_id % 5 + 1, 0.5) AS wq50,
          quantileExactWeighted(value, user_id % 5 + 1, 0.9) AS wq90,
          sumCount(CAST(round(value * 100) AS BIGINT)).sum AS sc_sum,
          sumCount(CAST(round(value * 100) AS BIGINT)).count AS sc_cnt,
          (quantileGK(value, 0.5, 5000)
             BETWEEN quantileExact(value, 0.48) AND quantileExact(value, 0.52)) AS gk_ok,
          round(arrayAUC(
            transform(array_sort(collect_list(struct(event_id, value))), p -> p.value),
            transform(array_sort(collect_list(struct(event_id,
              CAST(user_id % 2 AS INT)))), p -> p.col2)), 6) AS auc
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH w AS (
        SELECT event_type, value, user_id,
               unnest(range(user_id % 5 + 1)) AS rep
        FROM events),
      wq AS (
        SELECT event_type, quantile_disc(value, 0.5) AS wq50,
               quantile_disc(value, 0.9) AS wq90
        FROM w GROUP BY 1),
      base AS (
        SELECT event_type,
          round(sum(value * (user_id % 10 + 1)) / sum(user_id % 10 + 1), 6) AS aw,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc_sum,
          count(*) AS sc_cnt
        FROM events GROUP BY 1),
      rk AS (
        SELECT event_type, user_id % 2 AS lbl,
          rank() OVER (PARTITION BY event_type ORDER BY value)
            + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS r
        FROM events),
      auc AS (
        SELECT event_type,
          round((sum(CASE WHEN lbl = 1 THEN r ELSE 0 END)
                 - sum(CASE WHEN lbl = 1 THEN 1 ELSE 0 END)
                   * (sum(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) + 1) / 2.0)
                / (sum(CASE WHEN lbl = 1 THEN 1 ELSE 0 END)
                   * CAST(sum(CASE WHEN lbl = 0 THEN 1 ELSE 0 END) AS DOUBLE)), 6) AS auc
        FROM rk GROUP BY 1)
      SELECT base.event_type, base.aw, wq.wq50, wq.wq90,
             base.sc_sum, base.sc_cnt, true AS gk_ok, auc.auc
      FROM base JOIN wq ON base.event_type = wq.event_type
                JOIN auc ON base.event_type = auc.event_type
      ORDER BY base.event_type""")),

    // ---- q207: moment-matrix aggregates ---------------------------------
    // corrMatrix/covarSampMatrix/covarPopMatrix over three derived
    // numeric columns; one O(N^2)-state buffer vs the N^2 pairwise
    // aggregate calls the oracle composes. Matrices serialize row-major
    // through the floor(x*1e6 + 0.5) grid (both engines sit within
    // ~1e-8 of the true value; the q200 convention).
    QueryDef("q207_matrix_stats", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        WITH t AS (
          SELECT event_type, value AS a,
                 CAST(user_id % 17 AS DOUBLE) AS b,
                 CAST(event_id % 23 AS DOUBLE) AS c
          FROM events)
        SELECT event_type,
          array_join(transform(corrMatrix(a, b, c),
            r -> array_join(transform(r, v -> floor(v * 1000000 + 0.5d)), ',')), '|') AS corr_m,
          array_join(transform(covarPopMatrix(a, b, c),
            r -> array_join(transform(r, v -> floor(v * 1000000 + 0.5d)), ',')), '|') AS covp_m,
          array_join(transform(covarSampMatrix(a, b, c),
            r -> array_join(transform(r, v -> floor(v * 1000000 + 0.5d)), ',')), '|') AS covs_m
        FROM t GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH t AS (
        SELECT event_type, value AS a,
               CAST(user_id % 17 AS DOUBLE) AS b,
               CAST(event_id % 23 AS DOUBLE) AS c
        FROM events),
      m AS (
        SELECT event_type,
          corr(a, a) AS raa, corr(a, b) AS rab, corr(a, c) AS rac,
          corr(b, b) AS rbb, corr(b, c) AS rbc, corr(c, c) AS rcc,
          covar_pop(a, a) AS paa, covar_pop(a, b) AS pab, covar_pop(a, c) AS pac,
          covar_pop(b, b) AS pbb, covar_pop(b, c) AS pbc, covar_pop(c, c) AS pcc,
          covar_samp(a, a) AS saa, covar_samp(a, b) AS sab, covar_samp(a, c) AS sac,
          covar_samp(b, b) AS sbb, covar_samp(b, c) AS sbc, covar_samp(c, c) AS scc
        FROM t GROUP BY 1),
      f AS (
        SELECT event_type,
          concat_ws('|',
            concat_ws(',', CAST(floor(raa * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(rab * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(rac * 1000000 + 0.5) AS BIGINT)),
            concat_ws(',', CAST(floor(rab * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(rbb * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(rbc * 1000000 + 0.5) AS BIGINT)),
            concat_ws(',', CAST(floor(rac * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(rbc * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(rcc * 1000000 + 0.5) AS BIGINT))) AS corr_m,
          concat_ws('|',
            concat_ws(',', CAST(floor(paa * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(pab * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(pac * 1000000 + 0.5) AS BIGINT)),
            concat_ws(',', CAST(floor(pab * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(pbb * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(pbc * 1000000 + 0.5) AS BIGINT)),
            concat_ws(',', CAST(floor(pac * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(pbc * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(pcc * 1000000 + 0.5) AS BIGINT))) AS covp_m,
          concat_ws('|',
            concat_ws(',', CAST(floor(saa * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(sab * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(sac * 1000000 + 0.5) AS BIGINT)),
            concat_ws(',', CAST(floor(sab * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(sbb * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(sbc * 1000000 + 0.5) AS BIGINT)),
            concat_ws(',', CAST(floor(sac * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(sbc * 1000000 + 0.5) AS BIGINT),
                           CAST(floor(scc * 1000000 + 0.5) AS BIGINT))) AS covs_m
        FROM m)
      SELECT event_type, corr_m, covp_m, covs_m
      FROM f ORDER BY event_type""")),

    // ---- q208: presentation + tokenizer dialect -------------------------
    // formatReadable* gate exactly: the formatter rounds HALF_EVEN on
    // the exact binary value, matching C/{fmt} printf (and ClickHouse) —
    // dividing by 1024 produces honest dyadic halves like 703.125, where
    // Java's HALF_UP %.2f diverges (caught by this gate). bar() legs use integral block counts so the oracle is repeat();
    // eighth-block partials are pinned in ReadableSpec. The kv map
    // serializes entry-sorted; the oracle rebuilds the expected pairs
    // from the same columns without parsing.
    QueryDef("q208_readable", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        WITH e AS (
          SELECT event_id,
            formatReadableSize(value * 1000000) AS sz,
            formatReadableQuantity(value * value) AS qty,
            bar(CAST(user_id % 11 AS DOUBLE), 0, 10, 10) AS gauge,
            array_join(transform(array_sort(map_entries(extractKeyValuePairs(
              concat('type:', event_type, ', user:u', user_id % 10,
                     ';score: s', CAST(round(value) AS BIGINT))))),
              p -> concat(p.key, '=', p.value)), '|') AS kv
          FROM events),
        d AS (
          SELECT doc_id,
            array_join(alphaTokens(substring(text, 1, 30)), '|') AS toks,
            array_join(ngrams(substring(text, 1, 12), 3), '|') AS gr3
          FROM documents)
        SELECT event_id, sz, qty, gauge, kv, toks, gr3
        FROM e JOIN d ON d.doc_id = e.event_id % 500
        ORDER BY event_id""")
    }, Some("""
      WITH e AS (
        SELECT event_id,
          CASE
            WHEN value * 1000000 < 1024 THEN printf('%.2f B', value * 1000000)
            WHEN value * 1000000 < 1024 * 1024
              THEN printf('%.2f KiB', value * 1000000 / 1024)
            WHEN value * 1000000 < 1024 * 1024 * 1024
              THEN printf('%.2f MiB', value * 1000000 / 1024 / 1024)
            ELSE printf('%.2f GiB', value * 1000000 / 1024 / 1024 / 1024)
          END AS sz,
          CASE
            WHEN value * value < 1000 THEN printf('%.2f', value * value)
            WHEN value * value < 1000000
              THEN printf('%.2f thousand', value * value / 1000)
            WHEN value * value < 1000000000
              THEN printf('%.2f million', value * value / 1000000)
            ELSE printf('%.2f billion', value * value / 1000000000)
          END AS qty,
          repeat('█', CAST(user_id % 11 AS INT) * 10 // 10) AS gauge,
          concat('score=s', CAST(round(value) AS BIGINT),
                 '|type=', event_type, '|user=u', user_id % 10) AS kv
        FROM events),
      d AS (
        SELECT doc_id,
          array_to_string(list_filter(
            string_split_regex(substring(text, 1, 30), '[^a-zA-Z]+'),
            x -> x <> ''), '|') AS toks,
          array_to_string(list_transform(
            range(1, CAST(greatest(1, length(substring(text, 1, 12)) - 1) AS BIGINT)),
            i -> substr(substring(text, 1, 12), CAST(i AS INT), 3)), '|') AS gr3
        FROM documents)
      SELECT event_id, sz, qty, gauge, kv, toks, gr3
      FROM e JOIN d ON d.doc_id = e.event_id % 500
      ORDER BY event_id""")),

    // ---- q209: sparkbar ------------------------------------------------
    // Day-of-month activity sparkline per event type. Explicit bounds
    // (1, 30) pin the bucket mapping; y = round(value) keeps the bucket
    // sums integral, so both engines evaluate the identical
    // ceil(8·s/maxS) ladder on identical doubles. The oracle rebuilds
    // the string with string_agg over the mapped block characters.
    QueryDef("q209_sparkbar", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
          sparkbar(CAST(dayofmonth(ts) AS BIGINT),
                   CAST(round(value) AS DOUBLE), 10, 1, 30) AS spark
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH b AS (
        SELECT event_type,
               CAST((dayofmonth(ts) - 1) * 10 // 30 AS INT) AS bucket,
               sum(CAST(round(value) AS BIGINT)) AS s
        FROM events
        WHERE dayofmonth(ts) BETWEEN 1 AND 30
        GROUP BY 1, 2),
      mx AS (SELECT event_type, max(s) AS ms FROM b GROUP BY 1),
      cells AS (
        SELECT g.event_type, g.bucket, coalesce(b.s, 0) AS s, mx.ms
        FROM (SELECT DISTINCT event_type, gs.range AS bucket
              FROM b, range(10) gs) g
        LEFT JOIN b ON b.event_type = g.event_type AND b.bucket = g.bucket
        JOIN mx ON mx.event_type = g.event_type)
      SELECT event_type,
        string_agg(CASE WHEN ms <= 0 OR s <= 0 THEN ' '
                        ELSE substring('▁▂▃▄▅▆▇█',
                          CAST(least(8, ceil(8.0 * s / ms)) AS INT), 1)
                   END, '' ORDER BY bucket) AS spark
      FROM cells GROUP BY event_type ORDER BY event_type"""))
  )
}
