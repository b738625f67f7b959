package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: all pairs with |a.ts − b.ts| ≤ window, without the
  * quadratic cross join. Rows are bucketed by `window`-sized time bands;
  * one side explodes into (band, band+1), so every qualifying pair shares
  * a band key and the join is a plain equi-join + exact filter. At 100 TB
  * this is the difference between a shuffle keyed on time bands and a
  * broadcast-nested-loop that never finishes. (Same decomposition DuckDB's
  * IEJoin and Spark's own range-join hints use; public technique.)
  */
object RangeJoin {

  /** Self-join `df` on |ts−ts| ≤ windowSec with idCol< idCol dedup. */
  def selfWithin(df: DataFrame, idCol: String, tsCol: String,
      windowSec: Long): DataFrame = {
    val withBand = df.withColumn("__band",
      expr(s"unix_micros($tsCol) div ${windowSec * 1000000L}"))
    val a = withBand.select(
      col(idCol).as("i"), col(tsCol).as("ts_i"), col("__band"))
    // explode side B into {band-1, band, band+1}: |ts_i - ts_j| <= w
    // implies |band_i - band_j| <= 1 in either direction (pair order is
    // by id, not by time), so every qualifying pair lands on >=1 shared
    // band key; dropDuplicates collapses the multi-band hits
    val b = withBand.select(
      col(idCol).as("j"), col(tsCol).as("ts_j"),
      explode(array(col("__band") - 1, col("__band"), col("__band") + 1)).as("__band"))
    a.join(b, "__band")
      .filter(col("i") < col("j") &&
        abs(unix_micros(col("ts_i")) - unix_micros(col("ts_j"))) <= windowSec * 1000000L)
      .select("i", "j", "ts_i", "ts_j")
      .dropDuplicates("i", "j")
  }
}
