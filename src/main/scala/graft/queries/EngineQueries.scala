package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DictCatalog

import graft.Tables
import graft.operators.{AnnIndex, Catalog, SelectDialect}

/** Engine-surface battery, late round 9: dictionaries, arrayJoin,
  * WITH TOTALS, SAMPLE, and ALTER TABLE UPDATE mutations — the remaining
  * ClickHouse server features a MyScale user exercises that are PLAN or
  * CATALOG shapes rather than scalar functions.
  */
object EngineQueries {

  def defs: Seq[QueryDef] = Seq(

    // ---- q170: dictGet enrichment replaces the dimension join ---------
    // nation+region registered as broadcast dictionaries; the query is
    // the classic CH pattern: enrich facts by dictGet (nested, too)
    // instead of two joins. Oracle IS the join plan — hash-exact proves
    // the broadcast-lookup path ≡ the join it displaces.
    QueryDef("q170_dict_enrich", (s, dir) => {
      DictCatalog.register(s, "nation", Tables.nation(s, dir), "n_nationkey")
      DictCatalog.register(s, "region", Tables.region(s, dir), "r_regionkey")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql("""
        SELECT dictGet('nation', 'n_name', c_nationkey) AS nation,
               dictGet('region', 'r_name',
                       dictGet('nation', 'n_regionkey', c_nationkey)) AS region,
               count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        FROM customer
        GROUP BY 1, 2
        ORDER BY 1, 2""")
    }, Some("""
      SELECT n_name AS nation, r_name AS region,
             count(*) AS n,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
      ORDER BY 1, 2""")),

    // ---- q171: arrayJoin — the CH row-multiplier in the SELECT list ---
    QueryDef("q171_array_join", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT doc_id, w, count(*) AS n
        FROM (SELECT doc_id, arrayJoin(splitByChar(' ', text)) AS w
              FROM documents)
        GROUP BY doc_id, w
        ORDER BY doc_id, w""")
    }, Some("""
      SELECT doc_id, w, count(*) AS n
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY doc_id, w
      ORDER BY doc_id, w""")),

    // ---- q172: GROUP BY ... WITH TOTALS (one-pass grouping sets) ------
    QueryDef("q172_with_totals", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      SelectDialect.withTotals(
        li.filter(col("l_quantity") >= 25),
        keys = Seq(col("l_returnflag"), col("l_linestatus")),
        aggs = Seq(
          QueryDef.dsum(col("l_extendedprice")).as("rev"),
          count(lit(1)).as("n")))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
             count(*) AS n
      FROM lineitem
      WHERE l_quantity >= 25
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- q173: SAMPLE k/n — deterministic key-hash sampling -----------
    // The bucket arithmetic is portable (Knuth multiplicative hash), so
    // the oracle applies the IDENTICAL predicate: hash-exact proves the
    // sample is a pure function of the key, not of partitioning (the CH
    // repeatability contract).
    QueryDef("q173_sample_clause", (s, dir) => {
      val sampled = SelectDialect.sampleByKey(
        Tables.orders(s, dir), col("o_custkey"), num = 3, den = 10)
      sampled.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          QueryDef.dsum(col("o_totalprice")).as("price"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price
      FROM orders
      WHERE (o_custkey * 2654435761) % 4294967296 % 10 < 3
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),

    // ---- q174: ALTER TABLE UPDATE (mutation) --------------------------
    // Bulk-reprice parts >40 size by an exact decimal factor, then
    // aggregate the mutated table; the oracle computes the same mutation
    // as a CASE expression over the ORIGINAL table. Decimal(18,3) sums —
    // the mutated prices carry 3 decimals.
    QueryDef("q174_update_mutation", (s, dir) => {
      val root = AnnIndex.tmpRoot + "/mutcat_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val cat = Catalog(s, root)
      cat.create("part", Tables.part(s, dir))
      cat.updateWhere("part", col("p_size") > 40, Map(
        "p_retailprice" -> expr(
          "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)"),
        "p_type" -> concat(col("p_type"), lit(" (bulk)"))))
      cat.readRaw("part")
        .groupBy(col("p_brand"))
        .agg(
          sum(col("p_retailprice").cast("decimal(18,3)")).cast("double").as("price"),
          count(when(col("p_type").endsWith("(bulk)"), 1)).as("n_bulk"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }, Some("""
      SELECT p_brand,
        CAST(sum(CAST(CASE WHEN p_size > 40
          THEN CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)
          ELSE p_retailprice END AS DECIMAL(18,3))) AS DOUBLE) AS price,
        count(CASE WHEN p_size > 40 THEN 1 END) AS n_bulk,
        count(*) AS n
      FROM part
      GROUP BY p_brand
      ORDER BY p_brand""")),

    // ---- q175: ANY LEFT JOIN (first matching right row) ---------------
    // Orders joined to their FIRST lineitem — at most one right row per
    // order. The synthetic lineitem does NOT have TPC-H's unique
    // (orderkey, linenumber), so the pick order carries a full
    // tiebreaker (anyLeftJoin requires a TOTAL order — that's the
    // operator's determinism contract vs CH's arbitrary ANY). Oracle
    // spells the dedupe as QUALIFY row_number() = 1, the plan the
    // operator packages.
    QueryDef("q175_any_join", (s, dir) => {
      val joined = SelectDialect.anyLeftJoin(
        Tables.orders(s, dir), Tables.lineitem(s, dir).withColumnRenamed(
          "l_orderkey", "o_orderkey"),
        keys = Seq("o_orderkey"),
        pick = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice")))
      joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          count(col("l_linenumber")).as("n_matched"),
          sum(col("l_quantity")).as("first_line_qty"))
        .orderBy("o_orderpriority")
    }, Some("""
      WITH first_line AS (
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        QUALIFY row_number() OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) = 1)
      SELECT o_orderpriority,
             count(*) AS n_orders,
             count(l_linenumber) AS n_matched,
             sum(l_quantity) AS first_line_qty
      FROM orders LEFT JOIN first_line ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),

    // ---- q176: TTL row expiry -----------------------------------------
    // Copy events into the catalog, expire everything older than 30 days
    // before the stream's own max ts (deterministic "now"), aggregate
    // the survivors. CH applies TTL at merge; graft as a maintenance
    // pass — same visible result.
    QueryDef("q176_ttl_expiry", (s, dir) => {
      val ev = Tables.events(s, dir)
      val root = AnnIndex.tmpRoot + "/ttlcat_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val cat = Catalog(s, root)
      cat.create("events", ev)
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      cat.applyTtl("events", "ts", expr("INTERVAL 30 DAYS"),
        lit(maxTs))
      cat.readRaw("events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("oldest"))
        .orderBy("event_type")
    }, Some("""
      SELECT event_type, count(*) AS n, min(ts) AS oldest
      FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 30 DAY
      GROUP BY event_type
      ORDER BY event_type""")),

    // ---- q177: token search family ------------------------------------
    QueryDef("q177_token_search", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""
        SELECT doc_id,
          hasToken(text, 'data') AS has_data,
          hasTokenCaseInsensitive(text, 'DATA') AS has_data_ci,
          hasToken(text, 'dat') AS has_dat,
          array_join(transform(
            multiSearchAllPositions(text, array('the', 'data', 'xyzzy')),
            x -> CAST(x AS STRING)), ',') AS pos,
          size(tokens(text)) AS n_tokens
        FROM documents ORDER BY doc_id""")
    }, Some("""
      SELECT doc_id,
        regexp_matches(text, '(^|[^A-Za-z0-9])data([^A-Za-z0-9]|$)') AS has_data,
        regexp_matches(lower(text), '(^|[^a-z0-9])data([^a-z0-9]|$)') AS has_data_ci,
        regexp_matches(text, '(^|[^A-Za-z0-9])dat([^A-Za-z0-9]|$)') AS has_dat,
        array_to_string([instr(text, 'the'), instr(text, 'data'),
                         instr(text, 'xyzzy')], ',') AS pos,
        CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                             t -> length(t) > 0)) AS INT) AS n_tokens
      FROM documents ORDER BY doc_id""")),

    // ---- q178: topKWeighted + uniqUpTo --------------------------------
    // Heavy hitters by WEIGHT sum (quantity-weighted return flags) and
    // the bounded-state distinct counter, both exact: topKWeighted's
    // deterministic (weight desc, value asc) order makes the groupBy+
    // rank oracle expressible; uniqUpTo is least(count distinct, n+1).
    // uniqUpTo saturates on l_partkey (n=100 << distinct parts) and
    // counts exactly on l_returnflag (3 < n=10) — both legs gated.
    QueryDef("q178_weighted_topk", (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT l_linestatus,
          array_join(topKWeighted(l_returnflag,
            CAST(l_quantity AS BIGINT), 2), '|') AS top_flags,
          uniqUpTo(l_partkey, 100) AS parts_capped,
          uniqUpTo(l_returnflag, 10) AS flags_exact
        FROM lineitem
        GROUP BY l_linestatus ORDER BY l_linestatus""")
    }, Some("""
      WITH w AS (SELECT l_linestatus, l_returnflag AS v,
                        sum(CAST(l_quantity AS BIGINT)) AS n
                 FROM lineitem GROUP BY 1, 2),
      r AS (SELECT l_linestatus, v,
              row_number() OVER (PARTITION BY l_linestatus
                                 ORDER BY n DESC, v) AS rn
            FROM w),
      t AS (SELECT l_linestatus, array_to_string(list(v ORDER BY rn), '|') AS top_flags
            FROM r WHERE rn <= 2 GROUP BY l_linestatus),
      u AS (SELECT l_linestatus,
              least(count(DISTINCT l_partkey), 101) AS parts_capped,
              least(count(DISTINCT l_returnflag), 11) AS flags_exact
            FROM lineitem GROUP BY l_linestatus)
      SELECT u.l_linestatus, t.top_flags, u.parts_capped, u.flags_exact
      FROM u JOIN t ON t.l_linestatus = u.l_linestatus
      ORDER BY u.l_linestatus""")),

    // ---- q180: formatDateTime (%-syntax) ------------------------------
    // DuckDB strftime shares the %-vocabulary (with %M for minute where
    // CH/MySQL use %i) — hash-exact across every row of events proves
    // the pattern translation, including literal runs and %%.
    QueryDef("q180_format_datetime", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_id,
          formatDateTime(ts, '%Y-%m-%d %H:%i:%S') AS full,
          formatDateTime(ts, '%F') AS datepart,
          formatDateTime(ts, 'day %j of %Y (100%%)') AS doy
        FROM events ORDER BY event_id""")
    }, Some("""
      SELECT event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS full,
        strftime(ts, '%Y-%m-%d') AS datepart,
        strftime(ts, 'day %j of %Y (100%%)') AS doy
      FROM events ORDER BY event_id""")),

    // ---- q182: minMap / maxMap ----------------------------------------
    // sumMap's siblings (same single-shuffle tree buffer, min/max
    // combine). Unlike the summed leg (q158, rounded 6dp for fp
    // association), min/max PICK existing doubles — exact, no rounding.
    QueryDef("q182_minmax_map", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT cohort, array_join(mn.keys, '|') AS keys,
          array_join(transform(mn.values,
            v -> CAST(CAST(round(v * 1000000) AS BIGINT) AS STRING)), '|') AS lo,
          array_join(transform(mx.values,
            v -> CAST(CAST(round(v * 1000000) AS BIGINT) AS STRING)), '|') AS hi
        FROM (
          SELECT user_id % 10 AS cohort,
            minMap(array(event_type), array(value)) AS mn,
            maxMap(array(event_type), array(value)) AS mx
          FROM events GROUP BY user_id % 10)
        ORDER BY cohort""")
    }, Some("""
      WITH per AS (
        SELECT user_id % 10 AS cohort, event_type AS k,
               min(value) AS lo, max(value) AS hi
        FROM events GROUP BY 1, 2)
      SELECT cohort,
        array_to_string(list(k ORDER BY k), '|') AS keys,
        array_to_string(list(CAST(round(lo * 1000000) AS BIGINT) ORDER BY k), '|') AS lo,
        array_to_string(list(CAST(round(hi * 1000000) AS BIGINT) ORDER BY k), '|') AS hi
      FROM per GROUP BY cohort ORDER BY cohort"""))
  )
}
