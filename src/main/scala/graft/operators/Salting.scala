package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (100 TB posture: a handful of hot keys —
  * one viral session_id, one dominant language — can stall a shuffle
  * stage; AQE's skew-join split handles sort-merge joins, salting covers
  * the aggregation and broadcast-replicate cases).
  */
object Salting {

  /** Skewed ⋈ small equi-join with the small side replicated across
    * `buckets` salt values: the hot key's rows spread over `buckets`
    * reducers. Result is identical to the unsalted join (salt is a pure
    * routing key; it never reaches the output).
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(col(key)) + spark_partition_id() * 31L, lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))) // cast matches pmod long
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for skewed group
    * keys: phase 1 aggregates (key, salt) groups, phase 2 merges the
    * per-salt partials. `partials` must be algebraic (sum/count/min/max).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
      buckets: Int): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(valueCol.cast("string")), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("total"))
  }
}
