package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with `right.ts <= left.ts` within the same key — the classic
  * event-enrichment operator Spark lacks natively (SURVEY.md §2.3 notes
  * the gap; DuckDB/kdb/QuestDB ship it built in).
  *
  * Implementation is composition (preference order (a) of the build
  * rules), not a custom physical operator: tag both sides, union, and
  * carry the latest right payload forward with a last-value running
  * window. The payload travels as ONE struct, so all matched columns come
  * from the same right row atomically. Cost = one shuffle on (key) + a
  * per-partition sort — the same lower bound a dedicated as-of sort-merge
  * operator has, with AQE/skew handling for free. Right rows sort BEFORE
  * left rows at equal ts, giving inclusive (<=) semantics.
  */
object AsOfJoin {

  /** @param rightCols right payload columns, returned as `matched_<col>`
    *                  (all null when no right row precedes the left row).
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    val r = right.select(col(key), col(ts),
      struct(rightCols.map(col): _*).as("__payload"))
      .withColumn("__is_right", lit(1))
    val l = left
      .withColumn("__is_right", lit(0))
      .withColumn("__payload", lit(null).cast(r.schema("__payload").dataType))
    // null-fill the left-only columns so unionByName lines up
    val rAligned = (l.columns.toSet -- r.columns.toSet).foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }
    // right rows first at equal ts => right.ts <= left.ts matches
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__is_right") === 0)
      .drop("__is_right", "__payload")
    rightCols.foldLeft(out) { (df, c) =>
      df.withColumn(s"matched_$c", col(s"__match.$c"))
    }.drop("__match")
  }
}
