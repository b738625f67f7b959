package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark plan builder plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  *
  * Oracle-parity rules used throughout (see SURVEY.md §5):
  *   - every output column aliased identically on both sides;
  *   - every query totally ordered by a unique key on both sides;
  *   - floating-point aggregates computed via DECIMAL casts so both engines
  *     do *exact* arithmetic and land on bit-identical doubles (double
  *     summation order differs between engines; decimal summation is
  *     associative). A double can never sit exactly on a decimal rounding
  *     boundary (half-way points are non-dyadic), so the decimal cast is
  *     also engine-agnostic.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Exact decimal view of a double column (for associative aggregation). */
  def dec(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact sum of a product of 2-decimal doubles. Scale 6 covers the true
    * decimal expansion of a triple product (2+2+2 digits) while keeping the
    * double's 1e-11-ish binary error far from any rounding boundary — scale
    * 10 is NOT safe: Spark casts double→decimal via the shortest string
    * repr, DuckDB via the exact binary value, and at scale 10 those can
    * round a half-ulp case differently.
    */
  def dsum6(c: Column): Column = sum(dec(c, 28, 6)).cast("double")

  /** Exact mean: decimal sum / count, divided in double space. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
