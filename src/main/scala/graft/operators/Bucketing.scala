package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (100 TB posture: the lineitem⋈orders class of
  * join is THE recurring shuffle at scale; persisting both sides bucketed
  * and sorted by the join key makes every subsequent join a zero-exchange
  * sort-merge — the Spark analog of MergeTree's ORDER BY locality).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (idempotent). */
  def saveBucketed(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — planner elides both
    * shuffles when bucket counts match.
    */
  def cogroupJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
