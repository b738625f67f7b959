package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef._

/** Relational operator battery over the driver's TPC-H-ish tables
  * (TESTDATA.md). These are the "extensions mandated by BASELINE.json"
  * (SURVEY.md §2.3/§2.4/§2.5/§2.7 rows marked *not present in reference*
  * plus §7 step 8): equi/semi/anti joins, hash aggregation, windows,
  * rollup/cube/grouping sets, set ops, subqueries — all expressed
  * declaratively so Catalyst plans them (broadcast joins for the small
  * dimensions, partial aggregation, TakeOrderedAndProject for top-k).
  */
object TpchQueries {

  private def tsLit(s: String) = to_timestamp(lit(s))

  /** Shared Spark/DuckDB text (ANSI); exercises the SQL entry surface. */
  val rollupSql: String = """
      SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        count(*) AS n_customers,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer, nation, region
      WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation"""

  val groupingSetsSql: String = """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority"""

  val defs: Seq[QueryDef] = Seq(

    // ---- A1-class hash aggregation (TPC-H Q1 shape) --------------------
    QueryDef("q01_pricing_summary", (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= tsLit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // ---- T-class top-k without full sort (TakeOrderedAndProject) -------
    QueryDef("q02_topk_orders", (s, dir) => {
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(10)
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ---- J-class 3-way join + agg (TPC-H Q3 shape); customer dim joins
    // broadcast under AQE, lineitem stays the streaming side -------------
    QueryDef("q03_segment_revenue", (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < tsLit("1999-01-01"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > tsLit("1997-01-01"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(l("l_orderkey").as("l_orderkey"), o("o_orderdate").as("o_orderdate"))
        .agg(dsum6(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }, Some("""
      SELECT l_orderkey, o_orderdate,
        CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        AND o_orderdate < TIMESTAMP '1999-01-01' AND l_shipdate > TIMESTAMP '1997-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- left-semi join (EXISTS) ---------------------------------------
    QueryDef("q04_priority_with_bigline", (s, dir) => {
      val o = Tables.orders(s, dir)
      val big = Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- 6-table join chain (TPC-H Q5 shape); region/nation/supplier
    // broadcast — at 100 TB only lineitem×orders is a real shuffle -------
    QueryDef("q05_region_revenue", (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(
        col("o_orderdate") >= tsLit("1996-01-01") && col("o_orderdate") < tsLit("1998-01-01"))
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum6(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }, Some("""
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- selective filter + global agg (TPC-H Q6; pure scan, fully
    // pushed to parquet) -------------------------------------------------
    QueryDef("q06_forecast_revenue", (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= tsLit("1996-01-01") && col("l_shipdate") < tsLit("1998-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(
          dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
             count(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""")),

    // ---- W-class ranking window ----------------------------------------
    QueryDef("q07_top3_orders_per_customer", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }, Some("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---- W-class running aggregate (decimal => engine-agnostic) --------
    QueryDef("q08_running_value_per_user", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    }, Some("""
      SELECT user_id, event_id,
        CAST(sum(CAST(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      FROM events ORDER BY user_id, event_id""")),

    // ---- rollup ---------------------------------------------------------
    QueryDef("q09_rollup_region_nation", (s, dir) => {
      Seq("customer", "nation", "region")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(rollupSql)
    }, Some(rollupSql)),

    // ---- cube -----------------------------------------------------------
    QueryDef("q10_cube_orders", (s, dir) => {
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    }, Some("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""")),

    // ---- distinct aggregation ------------------------------------------
    QueryDef("q11_distinct_parts", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- set operations (SURVEY §2.7) ----------------------------------
    QueryDef("q12_setops_customers", (s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val big = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 200000).select(col("o_custkey").as("c_custkey"))
      val both    = seg.intersect(big).withColumn("tag", lit("both"))
      val segOnly = seg.except(big).withColumn("tag", lit("seg_only"))
      both.unionByName(segOnly).orderBy("tag", "c_custkey")
    }, Some("""
      SELECT c_custkey, 'both' AS tag FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      UNION ALL
      SELECT c_custkey, 'seg_only' AS tag FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      ORDER BY tag, c_custkey""")),

    // ---- grouping sets (SQL surface; identical text runs on DuckDB) ----
    QueryDef("q13_grouping_sets", (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(TpchQueries.groupingSetsSql)
    }, Some(groupingSetsSql)),

    // ---- IN-subquery chain (semi-join rewrite, SURVEY J1/P8) -----------
    QueryDef("q14_parts_of_big_orders", (s, dir) => {
      val bigOrders = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      val l = Tables.lineitem(s, dir)
      val lk = l.join(bigOrders, l("l_orderkey") === bigOrders("o_orderkey"), "left_semi")
      val p = Tables.part(s, dir)
      p.join(lk.select("l_partkey").distinct(),
          p("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, p_name, p_brand FROM part
      WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders WHERE o_totalprice > 400000))
      ORDER BY p_partkey""")),

    // ---- HAVING ---------------------------------------------------------
    QueryDef("q15_busy_suppliers", (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("total_qty"))
        .filter(col("n_lines") > 150)
        .orderBy("l_suppkey")
    }, Some("""
      SELECT l_suppkey, count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_suppkey HAVING count(*) > 150 ORDER BY l_suppkey""")),

    // ---- left-anti join (NOT EXISTS; SURVEY J3/S8 delete-by-key shape) -
    QueryDef("q16_customers_without_recent_orders", (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderdate") >= tsLit("2000-01-01"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }, Some("""
      SELECT c_mktsegment, count(*) AS n FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- scalar subquery ------------------------------------------------
    QueryDef("q17_above_avg_quantity", (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val avgRow = l.agg((dsum(col("l_quantity")) / count(lit(1))).as("a"))
      val a = avgRow.join(l)  // 1-row broadcast cross join, stays distributed
      a.filter(col("l_quantity") > col("a"))
        .agg(count(lit(1)).as("n_above"), max(col("a")).as("avg_qty"))
    }, Some("""
      SELECT count(*) AS n_above, max(a) AS avg_qty FROM lineitem, (
        SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
        FROM lineitem) t
      WHERE l_quantity > a"""))
  )
}
