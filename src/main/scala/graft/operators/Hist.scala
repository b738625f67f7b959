package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ClickHouse `histogram(N)(x)` — the adaptive-bin histogram aggregate
  * (CH "histogram" parametric aggregate function) — as a DETERMINISTIC
  * two-pass operator.
  *
  * ClickHouse's own implementation is a streaming-merge decision tree
  * whose result depends on row order ("the results are non-deterministic"
  * per its docs) — unusable here, where the determinism audit re-runs
  * every query at two partition counts and requires identical output.
  * The graft formulation keeps the adaptive-bin CONTRACT (N bins, denser
  * data → narrower bins, heights sum to the row count, outer bounds =
  * min/max) while being exact and partitioning-independent:
  *
  *   1. pass 1: `agg(min, max, count)` — exact, order-free;
  *   2. pass 2: exact counts over `N * fineFactor` uniform fine bins —
  *      a groupBy on the bin index (map-side partial combine, one shuffle
  *      of at most G tiny rows), order-free;
  *   3. a deterministic driver-side agglomerative merge of the (≤ G)
  *      non-empty fine bins down to N: repeatedly merge the adjacent pair
  *      with the smallest combined weight (ties: smaller center gap, then
  *      lowest index) — equi-depth-like, so dense regions keep narrow
  *      bins, which is the property users read an adaptive histogram for.
  *
  * Cost at 100 TB: two scans (the first prunable to the one column) and a
  * G-row shuffle; the merge is O(G²) driver-side on ≤ N·fineFactor rows —
  * scale-independent.
  */
object Hist {

  final case class Bin(lower: Double, upper: Double, height: Double)

  /** Exact fine-grid counts: bin i covers [lo + i·w, lo + (i+1)·w) with
    * the last bin closed. The bin expression is written EXACTLY as the
    * DuckDB oracle writes it — `least(floor(((v - lo) / (hi - lo)) * G),
    * G-1)` — so the IEEE double arithmetic is bit-identical on both
    * engines and the result hash-gates (q183).
    */
  def fineCounts(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      g: Int): DataFrame = {
    require(g > 0 && hi > lo, s"fineCounts needs hi>lo, g>0 (lo=$lo hi=$hi)")
    df.select(
        least(floor((col(valueCol) - lit(lo)) / lit(hi - lo) * lit(g)),
          lit((g - 1).toLong)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** The adaptive histogram: N bins (fewer when the data has fewer than N
    * non-empty fine bins; 1 when all values are equal; none when empty).
    */
  def bins(df: DataFrame, valueCol: String, n: Int,
      fineFactor: Int = 64): Seq[Bin] = {
    require(n > 0, "histogram needs n > 0")
    val stats = df.agg(
      min(col(valueCol).cast("double")).as("lo"),
      max(col(valueCol).cast("double")).as("hi"),
      count(col(valueCol)).as("cnt")).collect()(0)
    if (stats.isNullAt(0) || stats.getLong(2) == 0L) return Nil
    val (lo, hi, cnt) = (stats.getDouble(0), stats.getDouble(1), stats.getLong(2))
    if (lo == hi) return Seq(Bin(lo, hi, cnt.toDouble))

    val g = n * fineFactor
    val w = (hi - lo) / g
    val fine = fineCounts(df, valueCol, lo, hi, g)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)

    // working state: (lowerEdge, upperEdge, weight, weightedCenter)
    final case class Acc(lower: Double, upper: Double, wt: Long, ctr: Double)
    val acc = scala.collection.mutable.ArrayBuffer.from(fine.map { case (i, c) =>
      val l = if (i == 0) lo else lo + i * w
      val u = if (i == g - 1) hi else lo + (i + 1) * w
      Acc(l, u, c, lo + (i + 0.5) * w)
    })
    while (acc.length > n) {
      // adjacent pair with the smallest combined weight (equi-depth-ish:
      // sparse regions merge first, dense regions keep narrow bins);
      // ties → smaller center gap, then lowest index. All deterministic.
      var best = 0
      var bestWt = Long.MaxValue; var bestGap = Double.MaxValue
      var i = 0
      while (i < acc.length - 1) {
        val wt = acc(i).wt + acc(i + 1).wt
        val gap = acc(i + 1).ctr - acc(i).ctr
        if (wt < bestWt || (wt == bestWt && gap < bestGap)) {
          bestWt = wt; bestGap = gap; best = i
        }
        i += 1
      }
      val a = acc(best); val b = acc(best + 1)
      val wt = a.wt + b.wt
      acc(best) = Acc(a.lower, b.upper, wt,
        (a.ctr * a.wt + b.ctr * b.wt) / wt)
      acc.remove(best + 1)
    }
    // Contiguous output bins: empty fine-bin gaps between merged groups
    // are split at their midpoint, outer bounds stay the exact min/max —
    // so bounds are strictly increasing and cover [lo, hi] with no holes
    // (the shape a consumer of CH histogram() expects).
    val bounds = new Array[Double](acc.length + 1)
    bounds(0) = lo; bounds(acc.length) = hi
    var j = 1
    while (j < acc.length) {
      bounds(j) = (acc(j - 1).upper + acc(j).lower) / 2
      j += 1
    }
    acc.indices.map(i => Bin(bounds(i), bounds(i + 1), acc(i).wt.toDouble))
  }

  /** Bins as a DataFrame `(bin, lower, upper, height)` for query gating. */
  def histogramDF(spark: SparkSession, df: DataFrame, valueCol: String,
      n: Int, fineFactor: Int = 64): DataFrame = {
    import spark.implicits._
    bins(df, valueCol, n, fineFactor).zipWithIndex
      .map { case (b, i) => (i, b.lower, b.upper, b.height) }
      .toDF("bin", "lower", "upper", "height")
  }
}
