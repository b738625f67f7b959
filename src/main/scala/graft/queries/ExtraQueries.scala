package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.sql.graft.VectorFunctions.cosine_distance
import graft.functions.HashEmbedder

/** Extended SQL-surface coverage: the reference's composite acceptance
  * query shape, analytic windows, datetime/string/null functions,
  * percentiles, recursive CTEs, pivot.
  */
object ExtraQueries {

  private val qText = "semantic retrieval over filtered corpus"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  /** Shared Spark/DuckDB text: bucket customers by custkey decade via a
    * recursive generator, then join-aggregate.
    */
  val recursiveSql: String = """
      WITH RECURSIVE buckets(b) AS (
        SELECT 0
        UNION ALL
        SELECT b + 1 FROM buckets WHERE b < 9)
      SELECT b AS bucket, count(c_custkey) AS n_customers,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM buckets LEFT JOIN customer ON c_custkey % 10 = b
      GROUP BY b ORDER BY b"""

  private def tsLit2(x: String) = to_timestamp(lit(x))

  val groupByAllSql: String = """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY ALL
      ORDER BY o_orderstatus, o_orderpriority"""

  val defs: Seq[QueryDef] = Seq(

    // ---- the reference's de-facto acceptance query shape ---------------
    // ("published later than X and more than 2 categories and title like
    //  ... and has(...)" + kNN — myscale_tables.py:13-14; P4+P5+P6+P7+T1
    //  composed over documents⋈embeddings)
    QueryDef("q73_acceptance_combo", (s, dir) => {
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      d.join(e, d("doc_id") === e("vec_id"))
        .filter(col("n_chars") > 200 && col("text").like("%vector%") && col("lang") =!= "zh")
        .withColumn("dist", cosine_distance(col("embedding"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("dist"), col("doc_id"))
        .limit(5)
        .select(col("doc_id"), col("lang"), col("n_chars"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT doc_id, lang, n_chars,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE n_chars > 200 AND text LIKE '%vector%' AND lang <> 'zh'
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), doc_id
      LIMIT 5""")),

    // ---- analytic windows: first/last/nth value, percent_rank, cume ----
    QueryDef("q74_window_analytics", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir).filter(col("o_custkey") < 50)
        .withColumn("cheapest", first(col("o_totalprice")).over(wf))
        .withColumn("priciest", last(col("o_totalprice")).over(wf))
        .withColumn("second", nth_value(col("o_totalprice"), 2).over(wf))
        .withColumn("prank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("cheapest"), col("priciest"), col("second"),
          round(col("prank"), 6).as("prank"), round(col("cume"), 6).as("cume"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        first_value(o_totalprice) OVER wf AS cheapest,
        last_value(o_totalprice) OVER wf AS priciest,
        nth_value(o_totalprice, 2) OVER wf AS second,
        round(percent_rank() OVER w, 6) AS prank,
        round(cume_dist() OVER w, 6) AS cume
      FROM orders WHERE o_custkey < 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
             wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")),

    // ---- datetime part extraction --------------------------------------
    QueryDef("q75_datetime_parts", (s, dir) => {
      Tables.orders(s, dir)
        .groupBy(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n"))
        .orderBy("y", "q", "m")
    }, Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS y,
             CAST(quarter(o_orderdate) AS INT) AS q,
             CAST(month(o_orderdate) AS INT) AS m,
             strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n
      FROM orders GROUP BY 1, 2, 3, 4 ORDER BY y, q, m""")),

    // ---- string function battery ---------------------------------------
    QueryDef("q76_string_funcs", (s, dir) => {
      Tables.part(s, dir).filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 5).as("pre"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          lpad(col("p_brand"), 12, "*").as("pad"),
          reverse(col("p_type")).as("rev"),
          length(concat_ws("|", col("p_name"), col("p_type"))).cast("long").as("len2"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 5) AS pre,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
             lpad(p_brand, 12, '*') AS pad, reverse(p_type) AS rev,
             CAST(length(p_name || '|' || p_type) AS BIGINT) AS len2
      FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""")),

    // ---- null handling ---------------------------------------------------
    QueryDef("q77_null_handling", (s, dir) => {
      Tables.orders(s, dir).filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_nn"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_c"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floor_price"),
          least(col("o_totalprice"), lit(100000.0)).as("cap_price"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_nn,
             coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_c,
             greatest(o_totalprice, 100000.0) AS floor_price,
             least(o_totalprice, 100000.0) AS cap_price
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ---- exact interpolated percentiles ---------------------------------
    QueryDef("q78_percentiles", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("price_p90"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
        round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25,
        round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
        round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75,
        round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 6) AS price_p90
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- recursive CTE (identical text on both engines) -----------------
    QueryDef("q79_recursive_cte", (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(recursiveSql)
    }, Some(recursiveSql)),

    // ---- as-of join (point-in-time enrichment) --------------------------
    // Each purchase matched to the user's most recent prior view; oracle
    // is DuckDB's native ASOF LEFT JOIN, graft's composition is
    // union + last-value window (operators.AsOfJoin).
    QueryDef("q82_asof_join", (s, dir) => {
      import graft.operators.AsOfJoin
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id")
      AsOfJoin.join(purchases, views, "user_id", "ts", Seq("event_id", "ts"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("matched_event_id").as("view_id"), col("matched_ts").as("view_ts"))
        .orderBy("purchase_id")
    }, Some("""
      WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
           v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view')
      SELECT p.event_id AS purchase_id, p.user_id,
             r.event_id AS view_id, r.ts AS view_ts
      FROM p ASOF LEFT JOIN v r ON p.user_id = r.user_id AND p.ts >= r.ts
      ORDER BY purchase_id""")),

    // ---- kitchen sink: 7-table join chain -------------------------------
    // Every TPC-H-ish table in one plan: dims broadcast, facts shuffle
    // once; the plan-quality stressor.
    QueryDef("q89_kitchen_sink", (s, dir) => {
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderdate") >= tsLit2("1997-01-01"))
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val p = Tables.part(s, dir).filter(col("p_size") <= 20)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_lines"),
          QueryDef.dsum6(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"),
          countDistinct(sup("s_suppkey")).as("n_suppliers"))
        .orderBy("r_name")
    }, Some("""
      SELECT r_name, count(*) AS n_lines,
        CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        count(DISTINCT s_suppkey) AS n_suppliers
      FROM lineitem, orders, customer, nation, region, supplier, part
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND l_suppkey = s_suppkey AND l_partkey = p_partkey
        AND o_orderdate >= TIMESTAMP '1997-01-01' AND p_size <= 20
      GROUP BY r_name ORDER BY r_name""")),

    // ---- GROUP BY ALL (modern SQL; identical text both engines) ---------
    QueryDef("q90_group_by_all", (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(groupByAllSql)
    }, Some(groupByAllSql)),

    // ---- conditional + bitwise aggregates -------------------------------
    QueryDef("q85_conditional_aggs", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_quantity") > 25).as("n_big"),
          sum(when(col("l_discount") >= 0.05, 1).otherwise(0)).cast("long").as("n_disc"),
          bool_or(col("l_quantity") === 50).as("any_max"),
          bool_and(col("l_quantity") >= 1).as("all_pos"),
          bit_and(col("l_linenumber")).as("band"),
          bit_or(col("l_linenumber")).as("bor"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
        count(*) FILTER (l_quantity > 25) AS n_big,
        CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
        bool_or(l_quantity = 50) AS any_max,
        bool_and(l_quantity >= 1) AS all_pos,
        bit_and(l_linenumber) AS band,
        bit_or(l_linenumber) AS bor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- statistical aggregates (rounded: engines use different
    //      numerically-stable accumulation orders) ------------------------
    QueryDef("q86_statistical_aggs", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
        round(stddev_samp(l_quantity), 6) AS sd_qty,
        round(var_samp(l_quantity), 6) AS var_qty,
        round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- ALL-variant set operations -------------------------------------
    QueryDef("q87_setops_all", (s, dir) => {
      val hi = Tables.lineitem(s, dir).filter(col("l_quantity") >= 25)
        .select("l_orderkey")
      val lo = Tables.lineitem(s, dir).filter(col("l_quantity") < 25)
        .select("l_orderkey")
      val u  = hi.union(lo).distinct()                  // UNION (distinct)
      val ea = hi.exceptAll(lo)                          // EXCEPT ALL
      val ia = hi.intersectAll(lo)                       // INTERSECT ALL
      u.agg(count(lit(1)).as("n_union")).crossJoin(
          ea.agg(count(lit(1)).as("n_except_all")))
        .crossJoin(ia.agg(count(lit(1)).as("n_intersect_all")))
    }, Some("""
      SELECT
        (SELECT count(*) FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
          UNION SELECT l_orderkey FROM lineitem WHERE l_quantity < 25)) AS n_union,
        (SELECT count(*) FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
          EXCEPT ALL SELECT l_orderkey FROM lineitem WHERE l_quantity < 25)) AS n_except_all,
        (SELECT count(*) FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25
          INTERSECT ALL SELECT l_orderkey FROM lineitem WHERE l_quantity < 25)) AS n_intersect_all""")),

    // ---- interval arithmetic --------------------------------------------
    QueryDef("q88_interval_arith", (s, dir) => {
      Tables.orders(s, dir).filter(col("o_orderkey") <= 300)
        .select(
          col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due"),
          (col("o_orderdate") - expr("INTERVAL 1 HOUR")).as("cutoff"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_y2k"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             o_orderdate + INTERVAL 90 DAY AS due,
             o_orderdate - INTERVAL 1 HOUR AS cutoff,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k
      FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""")),

    // ---- banded range join ---------------------------------------------
    // Event pairs within 5 minutes of each other (any users) via time
    // bands — equi-join plan, never a nested loop. Oracle: DuckDB's
    // inequality join over the same predicate.
    QueryDef("q83_range_join", (s, dir) => {
      import graft.operators.RangeJoin
      val ev = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select("event_id", "ts")
      RangeJoin.selfWithin(ev, "event_id", "ts", windowSec = 300L)
        .select(col("i"), col("j"))
        .orderBy("i", "j")
    }, Some("""
      SELECT a.event_id AS i, b.event_id AS j
      FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') a,
           (SELECT event_id, ts FROM events WHERE event_type = 'purchase') b
      WHERE a.event_id < b.event_id
        AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
      ORDER BY i, j""")),

    // ---- EP3 document stuffing (format + ref-id + separator join) -------
    // The reference's CustomStuffDocumentChain: per-doc prompt format with
    // enumerated ref ids, joined by a separator into one context string
    // (stuff_documents.py:27-42, doc_prompt myscale_tables.py:77-80).
    QueryDef("q84_stuff_documents", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(desc("n_chars"), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("ref_id", row_number().over(w) - 1)
        .filter(col("ref_id") < 5)
        .withColumn("formatted", format_string("Doc #%d (%s): %s",
          col("ref_id"), col("lang"),
          regexp_replace(substring(col("text"), 1, 40), "\n", " ")))
        .groupBy()
        .agg(
          concat_ws("\n---\n", array_sort(collect_list(
            struct(col("ref_id"), col("formatted")))).getField("formatted"))
            .as("context"),
          count(lit(1)).as("n_docs"))
    }, Some("""
      WITH ranked AS (
        SELECT row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS ref_id,
               lang, text
        FROM documents)
      SELECT string_agg('Doc #' || ref_id || ' (' || lang || '): ' ||
                        replace(substr(text, 1, 40), chr(10), ' '),
                        chr(10) || '---' || chr(10) ORDER BY ref_id) AS context,
             count(*) AS n_docs
      FROM ranked WHERE ref_id < 5""")),

    // ---- EP1/EP3 end-to-end: ingest -> embed -> filtered retrieval ------
    // The full reference user story in one plan (SURVEY §3): parse/chunk
    // (S4), narrative filter (P9), sha ids, batch embed, then filtered
    // cosine top-k over the freshly ingested chunks. Rows-only: the
    // oracle cannot reproduce hash embeddings; invariants are asserted in
    // OperatorSpec.
    QueryDef("q81_e2e_rag_pipeline", (s, dir) => {
      import graft.operators.{Ingest, VectorStore, SelfQueryFilter => F}
      val chunks = Ingest.chunk(Tables.documents(s, dir), "doc_id", "source", "text")
      val kept = Ingest.narrativeFilter(chunks)
        .withColumn("entity_id", Ingest.withEntityId(chunks, "source", "chunk_text"))
      val embedded = Ingest.embed(kept, "chunk_text")
      VectorStore(embedded, "vector", Seq("entity_id"))
        .search("distributed query engine", 5,
          Some(F.In("source", Seq(F.S("src0"), F.S("src1"), F.S("src2")))))
        .select(col("doc_id"), col("chunk_idx"), col("source"),
          col("entity_id"), round(col("dist"), 6).as("dist"))
    }, None),

    // ---- pivot -----------------------------------------------------------
    QueryDef("q80_pivot_events", (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
      p.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    }, Some("""
      SELECT user_id,
        count(*) FILTER (event_type = 'click') AS click,
        count(*) FILTER (event_type = 'error') AS error,
        count(*) FILTER (event_type = 'purchase') AS purchase,
        count(*) FILTER (event_type = 'signup') AS signup,
        count(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))
  )

}
