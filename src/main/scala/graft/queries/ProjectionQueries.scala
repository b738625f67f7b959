package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ProjectionCatalog
import org.apache.spark.sql.graft.ProjectionCatalog.Measure
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.AnnIndex

/** Projection / materialized-rollup battery (ClickHouse `ADD PROJECTION`
  * + automatic selection; SURVEY §13 round-9 addendum).
  *
  * q168 defines a rollup projection over lineitem keyed by
  * (l_returnflag, l_linestatus) and then runs a plain base-table GROUP BY
  * on a key SUBSET with a key-only filter. The engine must serve it from
  * the projection — the query ASSERTS the optimizer substitution fired
  * (`ProjectionCatalog.servedByProjection`), so the oracle comparison
  * certifies the merged-partial algebra, not the trivial base plan.
  *
  * Exactness: l_quantity is integer-valued double (sums/avg exact under
  * re-association), l_extendedprice rides the decimal-cast pattern shared
  * with the oracle (QueryDef scaladoc).
  */
object ProjectionQueries {

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q168_projection_rollup", (s, dir) => {
      val basePath = s"$dir/lineitem.parquet"
      val projPath = AnnIndex.tmpRoot + "/proj_lineitem_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      ProjectionCatalog.define(s, "lineitem_by_flag_status", basePath, projPath,
        keys = Seq("l_returnflag", "l_linestatus"),
        measures = Seq(
          Measure("l_quantity"),
          Measure("l_extendedprice", Some(DecimalType(18, 2)))))
      val df = s.read.parquet(basePath)
        .filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          QueryDef.dsum(col("l_extendedprice")).as("sum_price"),
          avg(col("l_quantity")).as("avg_qty"))
        .orderBy("l_returnflag")
      require(ProjectionCatalog.servedByProjection(df),
        "q168: projection rewrite did not fire")
      df
    }, Some("""
      SELECT l_returnflag,
        sum(l_quantity) AS sum_qty,
        count(*) AS n,
        min(l_quantity) AS min_qty,
        max(l_quantity) AS max_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        avg(l_quantity) AS avg_qty
      FROM lineitem
      WHERE l_linestatus = 'F'
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),

    // ---- q169: AggregatingMergeTree materialized view, incremental ----
    // CREATE MV backfilled from ~half of orders, then three INSERT
    // batches (never re-reading the base), an OPTIMIZE FINAL mid-stream,
    // and a merge-on-read finalize. The oracle is the direct GROUP BY
    // over the WHOLE table — hash-exact means the insert-split partial
    // algebra reconstructs the one-shot aggregate bit-for-bit
    // (o_totalprice rides the decimal-cast pattern).
    QueryDef("q169_matview_incremental", (s, dir) => {
      val orders = Tables.orders(s, dir)
      val path = AnnIndex.tmpRoot + "/mv_orders_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val keys = Seq("o_orderpriority", "o_orderstatus")
      val measures = Seq(Measure("o_totalprice", Some(DecimalType(18, 2))))
      val mv = graft.operators.MatView.create(s, path, keys, measures,
        initial = orders.filter(col("o_orderkey") % 4 === 0))
      mv.insert(orders.filter(col("o_orderkey") % 4 === 1))
      mv.compact() // OPTIMIZE FINAL mid-stream: must not change results
      mv.insert(orders.filter(col("o_orderkey") % 4 === 2))
      mv.insert(orders.filter(col("o_orderkey") % 4 === 3))
      // partial log stays bounded: ≤ (#inserts since compact + 1) rows/key
      val groups = mv.merged.count()
      require(mv.partialCount() <= groups * 3,
        "q169: partial log exceeded the per-insert bound")
      mv.read()
        .select(col("o_orderpriority"), col("o_orderstatus"),
          col("sum_o_totalprice").cast("double").as("sum_price"),
          col("min_o_totalprice").as("min_price"),
          col("max_o_totalprice").as("max_price"),
          col("cnt").as("n"))
        .orderBy("o_orderpriority", "o_orderstatus")
    }, Some("""
      SELECT o_orderpriority, o_orderstatus,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        min(o_totalprice) AS min_price,
        max(o_totalprice) AS max_price,
        count(*) AS n
      FROM orders
      GROUP BY o_orderpriority, o_orderstatus
      ORDER BY o_orderpriority, o_orderstatus""")),

    // ---- q179: matview over the EVENT STREAM table --------------------
    // The canonical CH materialized-view use: a rolling per-event-type
    // rollup of the append-only events stream, populated in arrival
    // batches (split by event_id — the batch boundaries a stream would
    // produce), finalized at read. Oracle = one-shot GROUP BY over all
    // events.
    QueryDef("q179_matview_events", (s, dir) => {
      val ev = Tables.events(s, dir)
      val path = AnnIndex.tmpRoot + "/mv_events_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val measures = Seq(Measure("value", Some(DecimalType(18, 2))))
      val mv = graft.operators.MatView.create(s, path, Seq("event_type"),
        measures, initial = ev.filter(col("event_id") % 3 === 0))
      mv.insert(ev.filter(col("event_id") % 3 === 1))
      mv.insert(ev.filter(col("event_id") % 3 === 2))
      mv.read()
        .select(col("event_type"),
          col("sum_value").cast("double").as("total"),
          col("min_value").as("lo"), col("max_value").as("hi"),
          col("cnt").as("n"))
        .orderBy("event_type")
    }, Some("""
      SELECT event_type,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        min(value) AS lo, max(value) AS hi, count(*) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")),

    // ---- q181: projection × dictionary composition --------------------
    // The dashboard shape: a SQL-text aggregate over the base table,
    // grouped by a projection key, with the key enriched through
    // dictGet IN THE SELECT LIST — the optimizer must serve the
    // aggregate from the rollup while the dictionary probe rides above
    // it (the rewrite maps the key attr under the dictGet call).
    // Oracle = the join+full-scan plan both features displace.
    QueryDef("q181_projection_dict", (s, dir) => {
      import org.apache.spark.sql.graft.DictCatalog
      DictCatalog.register(s, "nation", Tables.nation(s, dir), "n_nationkey")
      val basePath = s"$dir/customer.parquet"
      val projPath = AnnIndex.tmpRoot + "/proj_customer_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      ProjectionCatalog.define(s, "customer_by_nation", basePath, projPath,
        keys = Seq("c_nationkey"),
        measures = Seq(Measure("c_acctbal", Some(DecimalType(18, 2)))))
      s.read.parquet(basePath).createOrReplaceTempView("customer")
      val df = s.sql("""
        SELECT dictGet('nation', 'n_name', c_nationkey) AS nation,
               count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal,
               max(c_acctbal) AS top_bal
        FROM customer
        GROUP BY c_nationkey
        ORDER BY nation""")
      require(ProjectionCatalog.servedByProjection(df),
        "q181: projection rewrite did not fire under the dictGet select")
      df
    }, Some("""
      SELECT n_name AS nation, count(*) AS n,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal,
             max(c_acctbal) AS top_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_nationkey, n_name
      ORDER BY nation"""))
  )
}
