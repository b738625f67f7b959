package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

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
      WHERE w.rk = 1 ORDER BY w.doc_id"""))
  )
}
