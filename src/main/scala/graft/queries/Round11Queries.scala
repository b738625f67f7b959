package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder

/** Round-11 battery: the encoding/bit/IP scalar dialect (hex/unhex,
  * base64 family, bitShift family, IPv4 family — the everyday ClickHouse
  * idioms the reference's Vector-SQL dialect teaches), `WITH FILL STEP
  * INTERVAL ... INTERPOLATE` (the monitoring-dashboard densify shape),
  * and the deterministic n-gram language-ID curation stage (the CCNet
  * pipeline stage in front of q133's perplexity filter).
  */
object Round11Queries {

  def defs: Seq[QueryDef] = Seq(

    // ---- q210: hex/unhex + base64 family -------------------------------
    // Divergences pinned in the oracle: CH hex(int) pads to whole bytes
    // ('01') where DuckDB prints '1' -> lpad to even length; CH unhex /
    // base64Decode return STRINGS where DuckDB returns BLOBs -> decode().
    // The tryBase64Decode failure case is invalid BY CONSTRUCTION ('!'
    // and ' ' are outside the base64 alphabet), so the oracle pins ''
    // without needing a DuckDB-side try-decode.
    QueryDef("q210_encoding_dialect", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT doc_id,
          hex(substring(text, 1, 6)) AS hx,
          unhex(hex(substring(text, 1, 6))) AS rt,
          hex(doc_id * 2654435761) AS hxn,
          base64Encode(substring(text, 1, 12)) AS b64,
          base64Decode(base64Encode(substring(text, 1, 12))) AS b64rt,
          tryBase64Decode(concat(substring(text, 1, 5), '!')) AS tryb,
          tryBase64Decode(base64Encode(source)) AS tryok
        FROM documents ORDER BY doc_id LIMIT 500""")
    }, Some("""
      SELECT doc_id,
        hex(substring(text, 1, 6)) AS hx,
        substring(text, 1, 6) AS rt,
        CASE WHEN length(hex(doc_id * 2654435761)) % 2 = 1
             THEN '0' || hex(doc_id * 2654435761)
             ELSE hex(doc_id * 2654435761) END AS hxn,
        to_base64(CAST(substring(text, 1, 12) AS BLOB)) AS b64,
        substring(text, 1, 12) AS b64rt,
        '' AS tryb,
        source AS tryok
      FROM documents ORDER BY doc_id LIMIT 500""")),

    // ---- q211: bitShiftLeft/Right + IPv4 family ------------------------
    // Shift operands kept inside DuckDB's non-overflow envelope (<=999
    // shifted by <8); the CH past-the-width rule (shift >= 64 -> 0) is
    // pinned against a literal because DuckDB RAISES there. The
    // isIPv4String boundary case walks octet values across 255 via
    // event_id % 300.
    QueryDef("q211_bits_ipv4", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          bitShiftLeft(event_id % 1000, event_id % 8) AS shl,
          bitShiftRight(event_id * 1048576, event_id % 8) AS shr,
          bitShiftLeft(event_id % 1000, 64) AS shl_past,
          IPv4NumToString((event_id * 2654435761) % 4294967296) AS ip,
          IPv4StringToNum(
            IPv4NumToString((event_id * 2654435761) % 4294967296)) AS ipn,
          isIPv4String(
            IPv4NumToString((event_id * 2654435761) % 4294967296)) AS ok_rt,
          isIPv4String(concat('10.0.0.', CAST(event_id % 300 AS STRING))) AS ok_oct,
          isIPv4String(concat('999.', CAST(event_id % 256 AS STRING), '.0.1')) AS ok_bad
        FROM events ORDER BY event_id LIMIT 500""")
    }, Some("""
      SELECT event_id,
        (event_id % 1000) << (event_id % 8) AS shl,
        (event_id * 1048576) >> (event_id % 8) AS shr,
        CAST(0 AS BIGINT) AS shl_past,
        CAST(((event_id * 2654435761) % 4294967296) // 16777216 AS VARCHAR)
          || '.' || CAST((((event_id * 2654435761) % 4294967296) // 65536) % 256 AS VARCHAR)
          || '.' || CAST((((event_id * 2654435761) % 4294967296) // 256) % 256 AS VARCHAR)
          || '.' || CAST(((event_id * 2654435761) % 4294967296) % 256 AS VARCHAR) AS ip,
        (event_id * 2654435761) % 4294967296 AS ipn,
        true AS ok_rt,
        event_id % 300 <= 255 AS ok_oct,
        false AS ok_bad
      FROM events ORDER BY event_id LIMIT 500""")),

    // ---- q212: WITH FILL STEP INTERVAL 6 HOUR + INTERPOLATE ------------
    // The monitoring-dashboard shape: 6-hour purchase buckets densified
    // over the frame's own [min, max] range; counts fill with 0, the
    // bucket average CARRIES FORWARD into gap rows (CH `INTERPOLATE (c AS
    // c)`). avg_v is exact integer arithmetic (floor(v + 0.5) per row,
    // BIGINT sum, integer div), so the carried values hash-gate. The
    // carry window orders the densified axis — (range / 6h) rows, scale-
    // independent of input volume.
    QueryDef("q212_fill_interpolate", (s, dir) => {
      val series = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 250)
        .groupBy(timestamp_seconds(
          expr("unix_timestamp(ts) div 21600") * 21600).as("b"))
        .agg(count(lit(1)).as("n"),
          expr("sum(cast(floor(value + 0.5) as bigint)) div count(1)").as("avg_v"))
      graft.operators.SelectDialect.withFillInterpolate(
        series, "b", expr("INTERVAL 6 HOUR"),
        fill = Map("n" -> lit(0L)), interpolate = Seq("avg_v"))
    }, Some("""
      WITH series AS (
        SELECT CAST(to_timestamp((CAST(epoch(ts) AS BIGINT) // 21600) * 21600)
                    AS TIMESTAMP) AS b,
               count(*) AS n,
               CAST(CAST(sum(CAST(floor(value + 0.5) AS BIGINT)) AS BIGINT)
                    // count(*) AS BIGINT) AS avg_v
        FROM events WHERE event_type = 'purchase' AND value > 250
        GROUP BY 1),
      spine AS (
        SELECT unnest(generate_series((SELECT min(b) FROM series),
                                      (SELECT max(b) FROM series),
                                      INTERVAL 6 HOUR)) AS b),
      j AS (
        SELECT spine.b, coalesce(series.n, 0) AS n, series.avg_v
        FROM spine LEFT JOIN series ON series.b = spine.b)
      SELECT b, n,
        last_value(avg_v IGNORE NULLS) OVER (
          ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v
      FROM j ORDER BY b""")),

    // ---- q213: deterministic n-gram language identification ------------
    // CCNet's langid stage (Wenzek et al. 2020) as exact integer
    // arithmetic: per-language char-bigram profiles (top-64, micro-nat
    // NLL — q133's recipe), broadcast back, every doc scored against
    // every language, argmin wins (ties to first lang). Gate = the
    // distributed pipeline is hash-exact; discrimination accuracy on
    // separable corpora is pinned in LangIdSpec (this synthetic corpus
    // shares one vocabulary across langs by design).
    QueryDef("q213_langid", (s, dir) => {
      val docs = Tables.documents(s, dir)
      val prof = graft.operators.LangId.profiles(docs, "lang", "text")
      graft.operators.LangId.classify(docs, prof, "doc_id", "text")
        .withColumnRenamed("lang", "pred")
        .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
        .select(col("id").as("doc_id"), col("pred"), col("nll_micro"),
          (col("pred") === col("lang")).as("hit"))
        .orderBy("doc_id")
    }, Some("""
      WITH g AS (
        SELECT doc_id, lang,
          unnest([substring(lower(text), i+1, 2) FOR i IN range(length(text)-1)]) AS g
        FROM documents),
      cnt AS (SELECT lang, g, count(*) AS cnt FROM g GROUP BY 1, 2),
      tot AS (SELECT lang, count(*) AS tot FROM g GROUP BY 1),
      prof AS (
        SELECT c.lang, c.g,
          CAST(round(ln(CAST(tot AS DOUBLE) / cnt) * 1000000) AS BIGINT) AS lpm
        FROM (SELECT lang, g, cnt,
                row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, g) AS rk
              FROM cnt) c JOIN tot ON tot.lang = c.lang
        WHERE c.rk <= 64),
      dg AS (
        SELECT doc_id,
          unnest([substring(lower(text), i+1, 2) FOR i IN range(length(text)-1)]) AS g
        FROM documents),
      perdoc AS (SELECT doc_id, count(*) AS n_grams FROM dg GROUP BY 1),
      langs AS (SELECT DISTINCT lang FROM prof),
      m AS (
        SELECT doc_id, lang, count(*) AS matched, CAST(sum(lpm) AS BIGINT) AS mnll
        FROM dg JOIN prof USING (g) GROUP BY 1, 2),
      sc AS (
        SELECT p.doc_id, l.lang,
          CAST(coalesce(m.mnll, 0) +
               (p.n_grams - coalesce(m.matched, 0)) * 15000000 AS BIGINT) AS nll_micro
        FROM perdoc p CROSS JOIN langs l
        LEFT JOIN m ON m.doc_id = p.doc_id AND m.lang = l.lang),
      win AS (
        SELECT doc_id, lang, nll_micro,
          row_number() OVER (PARTITION BY doc_id ORDER BY nll_micro, lang) AS rk
        FROM sc)
      SELECT w.doc_id, w.lang AS pred, w.nll_micro, w.lang = d.lang AS hit
      FROM win w JOIN documents d USING (doc_id)
      WHERE w.rk = 1 ORDER BY w.doc_id""")),

    // ---- q214: math/bit/rounding/conversion dialect battery -------------
    // (FnGap closure, SURVEY §16.) Divergences pinned in the oracle:
    // DuckDB spells banker's rounding round_even; roundToExp2 derives
    // from the binary text length (printf %b) — exact integer arithmetic
    // on both sides; truncate is the shared floor/ceil IEEE formula;
    // toInt8's wrap is explicit modular arithmetic. lgamma/erf/tgamma
    // are NOT gated here (libm last-bit drift) — DialectClosureSpec pins
    // them against reference values instead.
    QueryDef("q214_math_bits", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          gcd(event_id, 24) AS g, lcm(event_id % 7 + 1, 6) AS l,
          intExp2(CAST(event_id % 20 AS INT)) AS e2,
          intExp10(CAST(event_id % 10 AS INT)) AS e10,
          roundBankers(floor(value * 2) / 2) AS rb,
          truncate(value, 1) AS tr,
          roundToExp2(event_id + 1) AS r2,
          roundDuration(event_id % 40000) AS rd,
          roundAge(event_id % 100) AS ra,
          bitAnd(event_id, 2047) AS ba, bitOr(event_id, 15) AS bo,
          bitXor(event_id, 255) AS bx, bitNot(event_id) AS bn,
          bitCount(event_id) AS bc,
          bitHammingDistance(event_id, event_id + 1) AS bh,
          CAST(bitTest(event_id, 3) AS INT) AS bt,
          bitTestAll(event_id % 8 + 5, 0, 2) AS bta,
          countDigits(event_id * 37) AS cd,
          toInt8(event_id * 3) AS i8,
          toUInt8(event_id * 3) AS u8,
          toUInt32(0 - event_id - 1) AS u32,
          isFinite(value) AS fin
        FROM events ORDER BY event_id LIMIT 500""")
    }, Some("""
      SELECT event_id,
        gcd(event_id, 24) AS g, lcm(event_id % 7 + 1, 6) AS l,
        CAST(1::BIGINT << CAST(event_id % 20 AS INT) AS BIGINT) AS e2,
        CAST(10 ** CAST(event_id % 10 AS INT) AS BIGINT) AS e10,
        round_even(floor(value * 2) / 2, 0) AS rb,
        CASE WHEN value * 10 < 0 THEN ceil(value * 10) ELSE floor(value * 10) END / 10 AS tr,
        CAST(2 ** (length(printf('%b', event_id + 1)) - 1) AS BIGINT) AS r2,
        CASE WHEN event_id % 40000 < 1 THEN 0
             WHEN event_id % 40000 < 10 THEN 1 WHEN event_id % 40000 < 30 THEN 10
             WHEN event_id % 40000 < 60 THEN 30 WHEN event_id % 40000 < 120 THEN 60
             WHEN event_id % 40000 < 180 THEN 120 WHEN event_id % 40000 < 240 THEN 180
             WHEN event_id % 40000 < 300 THEN 240 WHEN event_id % 40000 < 600 THEN 300
             WHEN event_id % 40000 < 1200 THEN 600 WHEN event_id % 40000 < 1800 THEN 1200
             WHEN event_id % 40000 < 3600 THEN 1800 WHEN event_id % 40000 < 7200 THEN 3600
             WHEN event_id % 40000 < 18000 THEN 7200 WHEN event_id % 40000 < 36000 THEN 18000
             ELSE 36000 END AS rd,
        CASE WHEN event_id % 100 < 1 THEN 0 WHEN event_id % 100 <= 17 THEN 17
             WHEN event_id % 100 <= 24 THEN 18 WHEN event_id % 100 <= 34 THEN 25
             WHEN event_id % 100 <= 44 THEN 35 WHEN event_id % 100 <= 54 THEN 45
             ELSE 55 END AS ra,
        event_id & 2047 AS ba, event_id | 15 AS bo,
        xor(event_id, 255::BIGINT) AS bx, ~event_id AS bn,
        CAST(bit_count(event_id) AS INT) AS bc,
        CAST(bit_count(xor(event_id, event_id + 1)) AS INT) AS bh,
        CAST((event_id >> 3) & 1 AS INT) AS bt,
        ((event_id % 8 + 5) & 5) = 5 AS bta,
        CAST(length(CAST(abs(event_id * 37) AS VARCHAR)) AS INT) AS cd,
        CAST(((event_id * 3 + 128) % 256 + 256) % 256 - 128 AS TINYINT) AS i8,
        CAST(((event_id * 3) % 256 + 256) % 256 AS INT) AS u8,
        ((0 - event_id - 1) % 4294967296 + 4294967296) % 4294967296 AS u32,
        isfinite(value) AS fin
      FROM events ORDER BY event_id LIMIT 500""")),

    // ---- q215: hash + URL dialect battery --------------------------------
    // SHA-256 is byte-exact cross-engine (lower(hex(...)) vs DuckDB's hex
    // output); URL parts run graft's functions against hand-built string
    // arithmetic on a synthetic URL whose shape the oracle knows; \1
    // backref translation in replaceRegexpOne is exercised on a date
    // rewrite. halfMD5/javaHash/sipHash are spec-pinned (no DuckDB twin).
    QueryDef("q215_hash_url", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        WITH u AS (
          SELECT doc_id,
            concat('https://www.', source, '.example.com/docs/v', doc_id,
                   '/page?ref=', doc_id, '&lang=en#top') AS url,
            substring(text, 1, 16) AS frag
          FROM documents)
        SELECT doc_id,
          lower(hex(SHA256(frag))) AS sha,
          netloc(url) AS nl,
          cutWWW(url) AS nw,
          queryStringAndFragment(url) AS qf,
          array_join(extractURLParameters(url), '|') AS ps,
          array_join(extractURLParameterNames(url), '|') AS pn,
          array_join(URLPathHierarchy(url), '|') AS ph,
          firstSignificantSubdomain(url) AS fsd,
          cutToFirstSignificantSubdomain(url) AS cfsd,
          basename(path(url)) AS bn,
          appendTrailingCharIfAbsent(frag, '!') AS app,
          multiSearchFirstPosition(frag, array('the', 'a')) AS mfp,
          multiSearchFirstIndex(frag, array('zz99', 'a')) AS mfi,
          replaceRegexpOne(concat('d', doc_id, '-x'), '([a-z])([0-9]+)', '\\2\\1') AS rro
        FROM u ORDER BY doc_id LIMIT 500""")
    }, Some("""
      WITH u AS (
        SELECT doc_id,
          'https://www.' || source || '.example.com/docs/v' || doc_id ||
            '/page?ref=' || doc_id || '&lang=en#top' AS url,
          'www.' || source || '.example.com' AS host,
          '/docs/v' || doc_id || '/page' AS pth,
          substring(text, 1, 16) AS frag,
          source
        FROM documents)
      SELECT doc_id,
        sha256(frag) AS sha,
        host AS nl,
        'https://' || source || '.example.com' || pth ||
          '?ref=' || doc_id || '&lang=en#top' AS nw,
        'ref=' || doc_id || '&lang=en#top' AS qf,
        'ref=' || doc_id || '|lang=en' AS ps,
        'ref|lang' AS pn,
        '/docs/|/docs/v' || doc_id || '/|' || pth || '|' || pth ||
          '?ref=' || doc_id || '&lang=en#top' AS ph,
        'example' AS fsd,
        'example.com' AS cfsd,
        'page' AS bn,
        frag || '!' AS app,
        CAST(CASE WHEN strpos(frag, 'the') = 0 THEN strpos(frag, 'a')
             WHEN strpos(frag, 'a') = 0 THEN strpos(frag, 'the')
             ELSE least(strpos(frag, 'the'), strpos(frag, 'a')) END AS INT) AS mfp,
        CAST(CASE WHEN contains(frag, 'zz99') THEN 1
             WHEN contains(frag, 'a') THEN 2 ELSE 0 END AS INT) AS mfi,
        regexp_replace('d' || doc_id || '-x', '([a-z])([0-9]+)', '\2\1') AS rro
      FROM u ORDER BY doc_id LIMIT 500""")),

    // ---- q216: conversion/date/interval dialect battery ------------------
    // toDecimal32 is gated on INTEGER-valued doubles (floor first) so the
    // double->decimal rounding mode (Spark HALF_UP vs DuckDB exact-binary)
    // can never be consulted — the oracle-parity decimal rule.
    QueryDef("q216_conv_dates", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          CAST(toDecimal32(floor(value), 2) AS STRING) AS dec2,
          dateTrunc('day', ts) AS dt,
          addYears(ts, 1) AS ay,
          addWeeks(ts, 2) AS aw,
          subtractYears(ts, 1) AS sy,
          dateSub('day', 3, ts) AS ds,
          fromUnixTimestamp(event_id * 3600) AS fu,
          toRelativeDayNum(ts) AS rdn,
          ts + toIntervalHour(6) AS ih,
          ts + toIntervalDay(2) AS idy,
          ts + toIntervalWeek(1) AS iw,
          ts + toIntervalMonth(1) AS im,
          ts + toIntervalYear(1) AS iy,
          toSecond(ts) AS sec
        FROM events ORDER BY event_id LIMIT 500""")
    }, Some("""
      SELECT event_id,
        CAST(CAST(floor(value) AS DECIMAL(9,2)) AS VARCHAR) AS dec2,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS dt,
        ts + INTERVAL 1 YEAR AS ay,
        ts + INTERVAL 14 DAY AS aw,
        ts - INTERVAL 1 YEAR AS sy,
        ts - INTERVAL 3 DAY AS ds,
        CAST(to_timestamp(event_id * 3600) AS TIMESTAMP) AS fu,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT) AS rdn,
        ts + INTERVAL 6 HOUR AS ih,
        ts + INTERVAL 2 DAY AS idy,
        ts + INTERVAL 7 DAY AS iw,
        ts + INTERVAL 1 MONTH AS im,
        ts + INTERVAL 1 YEAR AS iy,
        CAST(second(ts) AS INT) AS sec
      FROM events ORDER BY event_id LIMIT 500""")),

    // ---- q217: vector-norm dialect on INTEGERIZED embeddings -------------
    // Elements are floored to integer-valued floats first, so every sum is
    // exact integer arithmetic in double — immune to the summation-order
    // difference between graft's sequential fold and DuckDB's list_sum.
    // Lp (fractional pow) is spec-pinned instead (libm last-bit drift).
    QueryDef("q217_vector_norms", (s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
      s.sql("""
        WITH v AS (
          SELECT vec_id,
            transform(embedding, x -> CAST(floor(x * 8) AS FLOAT)) AS a,
            transform(embedding, x -> CAST(floor(x * 5) AS FLOAT)) AS b
          FROM embeddings)
        SELECT vec_id,
          L1Distance(a, b) AS l1,
          L2SquaredDistance(a, b) AS l2s,
          LinfDistance(a, b) AS linf,
          L1Norm(a) AS n1,
          L2SquaredNorm(a) AS n2s,
          LinfNorm(a) AS ninf
        FROM v ORDER BY vec_id LIMIT 500""")
    }, Some("""
      WITH v AS (
        SELECT vec_id,
          [CAST(floor(CAST(x AS DOUBLE) * 8) AS DOUBLE) FOR x IN embedding] AS a,
          [CAST(floor(CAST(x AS DOUBLE) * 5) AS DOUBLE) FOR x IN embedding] AS b
        FROM embeddings)
      SELECT vec_id,
        list_sum([abs(a[i+1] - b[i+1]) FOR i IN range(len(a))]) AS l1,
        list_sum([(a[i+1] - b[i+1]) * (a[i+1] - b[i+1]) FOR i IN range(len(a))]) AS l2s,
        list_max([abs(a[i+1] - b[i+1]) FOR i IN range(len(a))]) AS linf,
        list_sum([abs(x) FOR x IN a]) AS n1,
        list_sum([x * x FOR x IN a]) AS n2s,
        list_max([abs(x) FOR x IN a]) AS ninf
      FROM v ORDER BY vec_id LIMIT 500""")),

    // ---- q218: collection dialect battery ---------------------------------
    // Arrays derive from sequence arithmetic so the oracle can BUILD the
    // expected outputs with list comprehensions; maps gate through sorted
    // key=value serialization (map iteration order is engine-defined).
    QueryDef("q218_collections", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        WITH t AS (
          SELECT event_id,
            sequence(1, CAST(event_id % 5 AS INT) + 2) AS arr,
            CAST(event_id % 3 AS INT) + 1 AS k
          FROM events)
        SELECT event_id,
          array_join(arrayPopBack(arr), ',') AS pb,
          array_join(arrayPopFront(arr), ',') AS pf,
          array_join(arrayResize(arr, 4, 0), ',') AS rs,
          arrayProduct(arr) AS pr,
          array_join(arrayRotateLeft(arr, k), ',') AS rl,
          array_join(arrayRotateRight(arr, k), ',') AS rr,
          array_join(arrayEnumerateUniq(concat(arr, arr)), ',') AS eu,
          hasSubstr(arr, slice(arr, 2, 2)) AS hs,
          array_join(array_sort(mapKeys(mapAdd(map('a', event_id, 'b', 1),
            map('b', 10, 'c', 2)))), ',') AS mk,
          element_at(mapAdd(map('a', event_id, 'b', 1), map('b', 10, 'c', 2)), 'b') AS mb,
          element_at(mapUpdate(map('a', event_id), map('a', 0 - event_id)), 'a') AS mu,
          element_at(mapSubtract(map('a', event_id), map('a', 3)), 'a') AS ms
        FROM t ORDER BY event_id LIMIT 500""")
    }, Some("""
      WITH t AS (
        SELECT event_id,
          [x FOR x IN range(1, CAST(event_id % 5 AS INT) + 3)] AS arr,
          CAST(event_id % 3 AS INT) + 1 AS k
        FROM events)
      SELECT event_id,
        array_to_string(arr[1:len(arr)-1], ',') AS pb,
        array_to_string(arr[2:len(arr)], ',') AS pf,
        array_to_string(CASE WHEN len(arr) >= 4 THEN arr[1:4]
          ELSE list_concat(arr, [0 FOR z IN range(4 - len(arr))]) END, ',') AS rs,
        CAST(list_product([CAST(x AS DOUBLE) FOR x IN arr]) AS DOUBLE) AS pr,
        array_to_string(list_concat(arr[(k % len(arr)) + 1:len(arr)],
          arr[1:k % len(arr)]), ',') AS rl,
        array_to_string(list_concat(
          arr[((len(arr) - k % len(arr)) % len(arr)) + 1:len(arr)],
          arr[1:(len(arr) - k % len(arr)) % len(arr)]), ',') AS rr,
        array_to_string(list_concat([1 FOR z IN arr], [2 FOR z IN arr]), ',') AS eu,
        true AS hs,
        'a,b,c' AS mk,
        CAST(11 AS BIGINT) AS mb,
        CAST(0 - event_id AS BIGINT) AS mu,
        CAST(event_id - 3 AS BIGINT) AS ms
      FROM t ORDER BY event_id LIMIT 500""")),

    // ---- q219: ordered-collection aggregates ------------------------------
    // groupArraySorted needs no order contract (the value IS the order);
    // groupArrayLast runs under the explicit-sort-key contract (event_id —
    // unique, so ties cannot arise and both engines agree exactly). The
    // n-smallest/n-last sets come from O(n) per-group heaps, never the
    // group's row count. categoricalInformationValue gates through the
    // q133 micro-rounding recipe: identical per-category IEEE terms,
    // rounded to 1e-8 on both engines, summed as exact integers.
    QueryDef("q219_ordered_collect", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT user_id,
          array_join(groupArraySorted(CAST(floor(value) AS BIGINT), 3), ',') AS small3,
          array_join(groupArrayLast(event_id, event_type, 2), ',') AS last2,
          CAST(round(categoricalInformationValue(event_type,
            CAST(value > 250 AS INT)) * 100000000) AS BIGINT) AS iv_c
        FROM events GROUP BY user_id ORDER BY user_id LIMIT 500""")
    }, Some("""
      WITH iv AS (
        SELECT user_id, event_type,
          count(*) FILTER (value > 250) AS g,
          count(*) FILTER (value <= 250) AS b
        FROM events GROUP BY 1, 2),
      tot AS (
        SELECT user_id, sum(g) AS gt, sum(b) AS bt FROM iv GROUP BY 1),
      terms AS (
        SELECT iv.user_id,
          CAST(round((CAST(g AS DOUBLE) / gt - CAST(b AS DOUBLE) / bt) *
            ln((CAST(g AS DOUBLE) * bt) / (CAST(b AS DOUBLE) * gt)) * 100000000)
            AS BIGINT) AS t
        FROM iv JOIN tot ON tot.user_id = iv.user_id
        WHERE g > 0 AND b > 0 AND gt > 0 AND bt > 0),
      agg AS (
        SELECT user_id,
          array_to_string((list_sort(list(CAST(floor(value) AS BIGINT))))[1:3], ',') AS small3,
          array_to_string(
            list(event_type ORDER BY event_id)[
              greatest(len(list(event_type ORDER BY event_id)) - 1, 1):], ',') AS last2
        FROM events GROUP BY 1)
      SELECT agg.user_id, agg.small3, agg.last2,
        CAST(coalesce((SELECT sum(t) FROM terms WHERE terms.user_id = agg.user_id),
          0) AS BIGINT) AS iv_c
      FROM agg ORDER BY agg.user_id LIMIT 500""")),

    // ---- q220: RAW ClickHouse SQL text through ChSql ---------------------
    // The reference's LLM emits ClickHouse SQL; this gates the clause
    // rewriter end-to-end on one realistic text: PREWHERE merging into
    // WHERE, `==`, GLOBAL IN, LIMIT n BY under ORDER BY, a trailing
    // FORMAT directive — against a DuckDB oracle written in standard SQL.
    QueryDef("q220_chsql_text", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      graft.operators.ChSql.sql(s, """
        SELECT user_id, event_id, value
        FROM events
        PREWHERE value > 100
        WHERE event_type == 'purchase'
          AND user_id GLOBAL IN (SELECT user_id FROM events
                                 PREWHERE event_type == 'click')
        ORDER BY user_id, value DESC, event_id
        LIMIT 2 BY user_id
        LIMIT 500
        FORMAT JSONEachRow""")
    }, Some("""
      SELECT user_id, event_id, value FROM events
      WHERE value > 100 AND event_type = 'purchase'
        AND user_id IN (SELECT user_id FROM events WHERE event_type = 'click')
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY value DESC, event_id) <= 2
      ORDER BY user_id, value DESC, event_id
      LIMIT 500""")),

    // ---- q221: CH SAMPLE clause through ChSql ----------------------------
    // SAMPLE k/n [OFFSET m/n] rewrites to the deterministic key-hash
    // bucket predicate (SelectDialect.sampleByKey's arithmetic — portable
    // IEEE/integer ops, so DuckDB can replicate it exactly). The two
    // offset slices must be disjoint; the oracle checks the SAME slices.
    QueryDef("q221_chsql_sample", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      graft.operators.ChSql.registerSampleKey("events", "user_id")
      val s1 = graft.operators.ChSql.sql(s, """
        SELECT user_id, event_id FROM events SAMPLE 1/4
        WHERE event_type == 'view'""")
      val s2 = graft.operators.ChSql.sql(s, """
        SELECT user_id, event_id FROM events SAMPLE 1/4 OFFSET 2/4
        WHERE event_type == 'view'""")
      s1.withColumn("slice", org.apache.spark.sql.functions.lit(0))
        .unionAll(s2.withColumn("slice",
          org.apache.spark.sql.functions.lit(2)))
        .orderBy("slice", "event_id")
        .limit(500)
    }, Some("""
      WITH b AS (
        SELECT user_id, event_id, event_type,
          ((CAST(user_id AS BIGINT) * 2654435761) % 4294967296) % 4 AS bucket
        FROM events)
      SELECT user_id, event_id, slice FROM (
        SELECT user_id, event_id, 0 AS slice FROM b
        WHERE bucket >= 0 AND bucket < 1 AND event_type = 'view'
        UNION ALL
        SELECT user_id, event_id, 2 AS slice FROM b
        WHERE bucket >= 2 AND bucket < 3 AND event_type = 'view')
      ORDER BY slice, event_id LIMIT 500""")),

    // ---- q223: CH DDL lifecycle through ChDdl ----------------------------
    // The reference app creates its tables with raw ClickHouse DDL
    // (private_knowledge_base.py:22-31) and mutates them with ALTER; this
    // gates the whole statement surface end-to-end on one lifecycle:
    // CREATE (ReplacingMergeTree + CONSTRAINT), INSERT SELECT x2 with
    // overlapping sort keys (last insert wins), ALTER DELETE WHERE
    // mutation, OPTIMIZE FINAL, then a FINAL read — against a DuckDB
    // oracle that computes the same net state in pure SQL.
    QueryDef("q223_chddl_lifecycle", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q223").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE chat.kb (
             entity_id String, file_name String, body String,
             user_id String, n_chars Int64,
             CONSTRAINT chars_nonneg CHECK n_chars >= 0
           ) ENGINE = ReplacingMergeTree ORDER BY entity_id""")
      x("""INSERT INTO chat.kb
           SELECT concat('doc_', CAST(doc_id AS STRING)), source, text,
                  lang, n_chars FROM documents""")
      x("""INSERT INTO chat.kb
           SELECT concat('doc_', CAST(doc_id AS STRING)), 'v2', upper(text),
                  lang, n_chars FROM documents PREWHERE doc_id % 7 == 0""")
      x("ALTER TABLE chat.kb DELETE WHERE user_id == 'de'")
      x("OPTIMIZE TABLE chat.kb FINAL")
      x("""SELECT entity_id, file_name, user_id, n_chars
           FROM chat_kb FINAL ORDER BY entity_id LIMIT 500""")
    }, Some("""
      WITH v2 AS (
        SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS entity_id,
               'v2' AS file_name, lang AS user_id, n_chars
        FROM documents WHERE doc_id % 7 = 0),
      base AS (
        SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS entity_id,
               source AS file_name, lang AS user_id, n_chars
        FROM documents),
      merged AS (
        SELECT * FROM v2
        UNION ALL
        SELECT * FROM base WHERE entity_id NOT IN (SELECT entity_id FROM v2))
      SELECT entity_id, file_name, user_id, n_chars FROM merged
      WHERE user_id <> 'de'
      ORDER BY entity_id LIMIT 500""")),

    // ---- q224: DDL-declared vector index, full-ef => exact ---------------
    // The reference's MSTG vector index, reached the way its users reach
    // it: declared in CREATE TABLE, built over the FINAL view
    // ([[graft.operators.ChDdl.buildVectorIndex]] -> GraphAnn), string
    // sort keys joined back through the xxhash64 surrogate. Full ef makes
    // the serve exhaustive, so DuckDB's brute-force cosine gates it
    // hash-exact (q114's convention).
    QueryDef("q224_chddl_vector_index", (s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q224").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE vkb (
             id String, vector Array(Float32),
             CONSTRAINT dim CHECK length(vector) = 64,
             VECTOR INDEX vidx vector TYPE MSTG('metric_type=Cosine')
           ) ENGINE = ReplacingMergeTree ORDER BY id""")
      x("""INSERT INTO vkb
           SELECT concat('v', CAST(vec_id AS STRING)), embedding
           FROM embeddings""")
      val (g, frame) = graft.operators.ChDdl.buildVectorIndex(cat, "vkb", "vidx")
      g.topKDF(s, HashEmbedder.embed("distributed vector search engine"),
          10, ef = g.rows.toInt)
        .join(frame.select(col("__vid").as("vec_id"), col("id")), "vec_id")
        .orderBy(col("dist"), col("id"))
        .select(col("id"), round(col("dist"), 6).as("dist"))
    }, Some {
      val qLit = HashEmbedder.sqlArrayLiteral(
        HashEmbedder.embed("distributed vector search engine"))
      s"""
      SELECT 'v' || CAST(vec_id AS VARCHAR) AS id,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])),
               'v' || CAST(vec_id AS VARCHAR)
      LIMIT 10"""
    }),

    // ---- q222: CH ARRAY JOIN clause through ChSql ------------------------
    // The FROM-position clause CH users reach for constantly: explode an
    // array expression (here a registered dialect function, splitByChar)
    // into rows, composed with PREWHERE in the same text. Rewrites to
    // LATERAL VIEW explode — Spark's native generator path (codegen'd,
    // no shuffle added; the groupBy below is the only exchange).
    QueryDef("q222_chsql_array_join", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      graft.operators.ChSql.sql(s, """
        SELECT lang, token, count(*) AS c
        FROM documents
        ARRAY JOIN splitByChar(' ', text) AS token
        PREWHERE n_chars > 200
        WHERE token != ''
        GROUP BY lang, token
        ORDER BY c DESC, lang, token
        LIMIT 200""")
    }, Some("""
      SELECT lang, token, count(*) AS c FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE n_chars > 200) u
      WHERE token <> ''
      GROUP BY lang, token
      ORDER BY c DESC, lang, token
      LIMIT 200""")),

    // ---- q225: GROUP BY ... WITH TOTALS through ChSql ---------------------
    // CH's per-group-rows-plus-grand-total clause → GROUPING SETS
    // ((keys), ()) — the NULL-keyed totals row convention both Spark and
    // DuckDB share natively. Exercised alongside PREWHERE and `==` on one
    // text; decimal-cast sums keep the totals row (the largest
    // re-association) bit-exact.
    QueryDef("q225_chsql_with_totals", (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      graft.operators.ChSql.sql(s, """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        PREWHERE l_shipdate <= TIMESTAMP '1998-09-01'
        WHERE l_discount == 0.05
        GROUP BY l_returnflag, l_linestatus WITH TOTALS
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    }, Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01' AND l_discount = 0.05
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- q226: CREATE MATERIALIZED VIEW through ChDdl ---------------------
    // CH matview = an INSERT TRIGGER: the AS SELECT runs over each
    // inserted block only, and reads merge with SummingMergeTree
    // semantics (sum every non-key column). The gate pins the trigger
    // contract: rows inserted BEFORE the view exists are absent (no
    // POPULATE), both later blocks land, OPTIMIZE FINAL materializes the
    // merge, and the read after it is identical. Oracle: DuckDB
    // aggregates the same two post-create slices directly.
    QueryDef("q226_chddl_matview", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q226").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE docs (
             doc_id Int64, lang String, source String, n_chars Int64
           ) ENGINE = MergeTree ORDER BY doc_id""")
      // pre-view block: must NOT appear in the view (CH trigger contract)
      x("INSERT INTO docs SELECT doc_id, lang, source, n_chars FROM documents PREWHERE doc_id % 3 == 0")
      x("""CREATE MATERIALIZED VIEW lang_stats
           ENGINE = SummingMergeTree ORDER BY (lang, source)
           AS SELECT lang, source, count(*) AS docs,
                     sum(n_chars) AS chars
              FROM docs GROUP BY lang, source""")
      x("INSERT INTO docs SELECT doc_id, lang, source, n_chars FROM documents PREWHERE doc_id % 3 == 1")
      x("INSERT INTO docs SELECT doc_id, lang, source, n_chars FROM documents PREWHERE doc_id % 3 == 2")
      x("OPTIMIZE TABLE lang_stats FINAL")
      x("""SELECT lang, source, docs, chars FROM lang_stats
           ORDER BY lang, source""")
    }, Some("""
      SELECT lang, source, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents WHERE doc_id % 3 IN (1, 2)
      GROUP BY lang, source
      ORDER BY lang, source""")),

    // ---- q227: ALTER TABLE column DDL through ChDdl -----------------------
    // The schema-evolution mutations a CH user runs between reloads:
    // ADD COLUMN with DEFAULT (pre-existing rows get the default —
    // CH materializes lazily per part, this engine rewrites eagerly in
    // one job, same total work, deterministic), RENAME, MODIFY (type
    // cast), DROP. Oracle recomputes the net schema state directly.
    QueryDef("q227_chddl_alter_columns", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q227").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id""")
      x("""INSERT INTO d SELECT doc_id, lang, n_chars
           FROM documents PREWHERE doc_id % 2 == 0""")
      x("ALTER TABLE d ADD COLUMN flagged UInt8 DEFAULT 0")
      x("""INSERT INTO d (doc_id, lang, n_chars, flagged)
           SELECT doc_id, lang, n_chars, 1
           FROM documents PREWHERE doc_id % 2 == 1""")
      x("ALTER TABLE d RENAME COLUMN n_chars TO len")
      x("ALTER TABLE d MODIFY COLUMN len Int32")
      x("ALTER TABLE d DROP COLUMN lang")
      x("SELECT doc_id, len, flagged FROM d ORDER BY doc_id LIMIT 500")
    }, Some("""
      SELECT doc_id, CAST(n_chars AS INTEGER) AS len,
             CAST(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS SMALLINT) AS flagged
      FROM documents ORDER BY doc_id LIMIT 500""")),

    // ---- q228: CTAS + RENAME blue/green swap through ChDdl ----------------
    // The deploy pattern CH users actually run: build the next table
    // version with CREATE TABLE ... AS SELECT (schema inferred from the
    // dialect SELECT), then swap it in with the all-metadata
    // RENAME/EXCHANGE — zero data movement at the swap. The read after
    // the swap is the gate.
    QueryDef("q228_chddl_ctas_swap", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q228").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE live ENGINE = MergeTree ORDER BY lang AS
           SELECT lang, count(*) AS docs FROM documents GROUP BY lang""")
      x("""CREATE TABLE next ENGINE = MergeTree ORDER BY lang AS
           SELECT lang, count(*) AS docs, sum(n_chars) AS chars
           FROM documents PREWHERE n_chars > 100 GROUP BY lang""")
      x("EXCHANGE TABLES live AND next")
      x("DROP TABLE next")
      x("SELECT lang, docs, chars FROM live FINAL ORDER BY lang")
    }, Some("""
      SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents WHERE n_chars > 100
      GROUP BY lang ORDER BY lang""")),

    // ---- q229: WITH FILL raw-text form through ChSql ----------------------
    // The monitoring-dashboard shape as the LLM would emit it: a sparse
    // daily series densified by ORDER BY ... WITH FILL STEP INTERVAL,
    // counts gap-filling to the type default and the peak column
    // carrying forward via INTERPOLATE. The executing entry point honors
    // the clause (q165/q212 gate the plan form; this gates the TEXT
    // path); ChSql.rewrite alone still rejects it loudly.
    QueryDef("q229_chsql_with_fill", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      graft.operators.ChSql.sql(s, """
        SELECT day, cnt, peak FROM (
          SELECT date_trunc('DAY', ts) AS day, count(*) AS cnt,
                 max(value) AS peak
          FROM events
          PREWHERE event_type == 'purchase' AND user_id % 17 == 3
          GROUP BY date_trunc('DAY', ts)) x
        ORDER BY day WITH FILL STEP INTERVAL 1 DAY INTERPOLATE (peak)""")
    }, Some("""
      WITH agg AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS cnt,
               CAST(max(value) AS DOUBLE) AS peak
        FROM events WHERE event_type = 'purchase' AND user_id % 17 = 3
        GROUP BY 1),
      spine AS (
        SELECT unnest(generate_series((SELECT min(day) FROM agg),
                                      (SELECT max(day) FROM agg),
                                      INTERVAL 1 DAY)) AS day),
      joined AS (
        SELECT s.day, coalesce(a.cnt, 0) AS cnt, a.peak AS p
        FROM spine s LEFT JOIN agg a USING (day))
      SELECT day, CAST(cnt AS BIGINT) AS cnt,
             last_value(p IGNORE NULLS) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS peak
      FROM joined ORDER BY day""")),

    // ---- q230: AggregatingMergeTree matview through ChDdl -----------------
    // The -State/-Merge path: exact-distinct and mean states merge
    // ACROSS insert blocks (sources overlap between the two blocks, so a
    // summed per-block count(distinct) would over-count — the state
    // must carry the value set), OPTIMIZE FINAL materializes merged
    // state, and the read finalizes (uniq → cardinality, avg → s/c).
    // Oracle: DuckDB aggregates the union of both blocks directly.
    QueryDef("q230_chddl_agg_matview", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q230").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE docs (doc_id Int64, lang String, source String,
           n_chars Int64) ENGINE = MergeTree ORDER BY doc_id""")
      x("""CREATE MATERIALIZED VIEW lang_states
           ENGINE = AggregatingMergeTree ORDER BY lang
           AS SELECT lang, uniqExactState(source) AS srcs,
                     avgState(n_chars) AS mean_chars,
                     maxState(n_chars) AS max_chars,
                     countState(doc_id) AS n
              FROM docs GROUP BY lang""")
      x("""INSERT INTO docs SELECT doc_id, lang, source, n_chars
           FROM documents PREWHERE doc_id % 2 == 0""")
      x("""INSERT INTO docs SELECT doc_id, lang, source, n_chars
           FROM documents PREWHERE doc_id % 2 == 1""")
      x("OPTIMIZE TABLE lang_states FINAL")
      x("SELECT lang, srcs, mean_chars, max_chars, n FROM lang_states ORDER BY lang")
    }, Some("""
      SELECT lang, CAST(count(DISTINCT source) AS BIGINT) AS srcs,
             CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(n_chars)
               AS mean_chars,
             max(n_chars) AS max_chars,
             CAST(count(doc_id) AS BIGINT) AS n
      FROM documents GROUP BY lang ORDER BY lang""")),

    // ---- q231: partition-pruned mutations through the DDL surface ---------
    // The retention shape at 100 TB: a lang-partitioned table mutated by
    // ALTER DELETE (whole partition → directory drop), DELETE FROM
    // (partial, one partition → one partition rewritten; MutationSoak
    // measures 31× vs the full rewrite) and an UPDATE on another — the
    // final read gates the net state vs DuckDB recomputing it directly.
    QueryDef("q231_chddl_partition_mutations", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      val cat = graft.operators.Catalog(s,
        java.nio.file.Files.createTempDirectory("q231").toString)
      val x = graft.operators.ChDdl.execute(cat, _: String)
      x("""CREATE TABLE d (doc_id Int64, lang String, n_chars Int64)
           ENGINE = MergeTree ORDER BY doc_id PARTITION BY lang""")
      x("INSERT INTO d SELECT doc_id, lang, n_chars FROM documents")
      x("ALTER TABLE d DELETE WHERE lang == 'de'")          // whole partition
      x("DELETE FROM d WHERE lang == 'en' AND doc_id % 4 == 0") // partial
      x("ALTER TABLE d UPDATE n_chars = n_chars + 1000000 WHERE lang == 'fr'")
      x("""SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
           FROM d GROUP BY lang ORDER BY lang""")
    }, Some("""
      SELECT lang, count(*) AS docs,
             CAST(sum(CASE WHEN lang = 'fr' THEN n_chars + 1000000
                           ELSE n_chars END) AS BIGINT) AS chars
      FROM documents
      WHERE lang <> 'de' AND NOT (lang = 'en' AND doc_id % 4 = 0)
      GROUP BY lang ORDER BY lang"""))
  )
}
