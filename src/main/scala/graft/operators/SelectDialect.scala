package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse SELECT-clause extensions that are PLAN shapes rather than
  * functions, Spark-first (ClickHouse docs "LIMIT BY clause" /
  * "ORDER BY ... WITH FILL"):
  *
  *   - `LIMIT n BY cols` — first n rows per group in the query's order.
  *     One window (rank inside the group's hash partition), no extra
  *     shuffle beyond the partitionBy exchange Catalyst plans anyway;
  *     at 100 TB this is the "top-n per key" shape AQE handles with
  *     skew-aware partitioning.
  *   - `WITH FILL STEP s` — densify an ordered time/number axis by
  *     generating the missing points and left-joining the data onto the
  *     spine. The spine derives from the frame's own min/max (one tiny
  *     agg broadcast both ways), `sequence()` + explode generates it
  *     distributed, and the join key is the axis value — so the fill
  *     never collects to the driver and scales with (range/step), not
  *     with input rows.
  */
object SelectDialect {

  /** ClickHouse `... ORDER BY <order> LIMIT <n> BY <by>`: the first `n`
    * rows of each `by` group under `order`. Deterministic iff `order` is
    * total within groups (give it a tiebreaker, as q164 does).
    */
  def limitBy(df: DataFrame, n: Int, by: Seq[Column], order: Seq[Column]): DataFrame = {
    require(n > 0 && by.nonEmpty && order.nonEmpty, "limitBy(n>0, by, order)")
    val w = Window.partitionBy(by: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** ClickHouse `ORDER BY <axisCol> WITH FILL STEP <step>`: densify the
    * axis from its own min to max at `step` (a Spark interval expression
    * for timestamps, e.g. `expr("INTERVAL 1 DAY")`, or a numeric literal
    * for numbers), left-joining the data and filling the given columns
    * with defaults. Empty input yields empty output (no spine).
    */
  def withFill(df: DataFrame, axisCol: String, step: Column,
      fill: Map[String, Column]): DataFrame = {
    val spine = df.agg(min(col(axisCol)).as("__lo"), max(col(axisCol)).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"), step)).as(axisCol))
    val filled = fill.foldLeft(spine.join(df, Seq(axisCol), "left")) {
      case (acc, (c, dflt)) => acc.withColumn(c, coalesce(col(c), dflt))
    }
    filled.orderBy(axisCol)
  }

  /** ClickHouse `ORDER BY <axisCol> WITH FILL STEP <step> INTERPOLATE
    * (cols)`: like [[withFill]], but the interpolated columns CARRY the
    * last observed value forward into filled gap rows (CH's default
    * `INTERPOLATE (c AS c)` form — the monitoring-dashboard shape;
    * compounding `AS c + expr` forms are sequential by definition and
    * not supported). `fill` columns still take literal defaults.
    *
    * Scale: the carry-forward window orders the DENSIFIED AXIS, whose
    * row count is (range/step) — a dashboard series, not the input —
    * so when `series` is empty the single window partition is bounded
    * by the spine, never by data volume. Pass `series` keys to
    * interpolate per series with a hash-partitioned window.
    */
  def withFillInterpolate(df: DataFrame, axisCol: String, step: Column,
      fill: Map[String, Column], interpolate: Seq[String],
      series: Seq[String] = Seq.empty,
      from: Option[Column] = None, to: Option[Column] = None): DataFrame = {
    // spine bounds: CH `WITH FILL FROM a TO b` literals override the
    // data min/max; TO is EXCLUSIVE (CH semantics), the data-derived
    // max stays inclusive. Rows whose axis value is OFF the step grid
    // are kept (CH interleaves them): the spine unions the grid with
    // the observed axis values, so the left join can never drop data.
    val spineAgg =
      if (series.isEmpty) df.agg(min(col(axisCol)).as("__lo"), max(col(axisCol)).as("__hi"))
      else df.groupBy(series.map(col): _*)
        .agg(min(col(axisCol)).as("__lo"), max(col(axisCol)).as("__hi"))
    val lo = from.getOrElse(col("__lo"))
    val hi = to.getOrElse(col("__hi"))
    var spine = spineAgg.select(
      series.map(col) :+ explode(sequence(lo, hi, step)).as(axisCol): _*)
    to.foreach(t => spine = spine.filter(col(axisCol) < t))
    val gridded = spine
      .union(df.select((series.map(col) :+ col(axisCol)): _*))
      .distinct()
    val joined = gridded.join(df, series :+ axisCol, "left")
    val filled = fill.foldLeft(joined) {
      case (acc, (c, dflt)) => acc.withColumn(c, coalesce(col(c), dflt))
    }
    val w0 = if (series.isEmpty) Window.orderBy(axisCol)
      else Window.partitionBy(series.map(col): _*).orderBy(axisCol)
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = interpolate.foldLeft(filled) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.orderBy(series.map(col) :+ col(axisCol): _*)
  }

  /** ClickHouse `GROUP BY <keys> WITH TOTALS`: the per-group rows PLUS
    * one grand-total row with NULL keys (ClickHouse docs "WITH TOTALS
    * modifier"). ONE pass over the input — `GROUPING SETS ((keys), ())`,
    * which Spark plans as a single expand+aggregate, not two scans.
    * Contract note: EMPTY input produces NO rows (Spark's grouping-sets
    * aggregate groups by the expanded gid, so the `()` set vanishes with
    * the input — unlike a bare global aggregate's one null-ish row).
    */
  def withTotals(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty, "withTotals(keys, aggs)")
    df.groupingSets(Seq(keys, Seq.empty), keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** ClickHouse `ANY LEFT JOIN`: at most ONE right-side row per left row
    * (CH docs "JOIN clause", ANY strictness). ClickHouse picks an
    * arbitrary match; graft requires a total `pick` order and takes the
    * FIRST right row under it, making the operator deterministic (and
    * oracle-expressible — q175). Plan: the right side dedupes with one
    * window rank inside its join-key hash partition, then a plain
    * equi-join; both exchanges are on the join key, so AQE can still
    * broadcast a small deduped right side.
    */
  def anyLeftJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      pick: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && pick.nonEmpty, "anyLeftJoin(keys, pick)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(pick: _*)
    val firstMatch = right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    left.join(firstMatch, keys, "left")
  }

  /** ClickHouse `SAMPLE k/n [OFFSET m/n]` over a table with
    * `SAMPLE BY <keyCol>`: a DETERMINISTIC subset chosen by key hash, so
    * the same key always lands in the same sample (repeatable queries,
    * consistent joins between sampled tables — the CH contract; docs
    * "SAMPLE clause"). Knuth multiplicative hashing over the key makes
    * the bucket assignment portable arithmetic (`key*2654435761 mod 2^32
    * mod den`), i.e. expressible in any engine, and the predicate is a
    * plain filter — it pushes to the parquet scan.
    */
  def sampleByKey(df: DataFrame, keyCol: Column, num: Int, den: Int,
      offset: Int = 0): DataFrame = {
    require(num > 0 && den > num && offset >= 0, "sampleByKey(num < den)")
    val bucket = pmod(pmod(keyCol.cast("long") * lit(2654435761L),
      lit(4294967296L)), lit(den.toLong))
    // the sampled window wraps modulo den, like CH's OFFSET arithmetic
    val lo = offset.toLong % den
    val hi = lo + num
    if (hi <= den) df.filter(bucket >= lo && bucket < hi)
    else df.filter(bucket >= lo || bucket < (hi % den))
  }
}
