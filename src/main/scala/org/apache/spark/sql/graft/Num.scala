package org.apache.spark.sql.graft

import org.apache.spark.sql.types.Decimal

/** Shared numeric coercion for the aggregate/expression families that
  * accept any NumericType in checkInputDataTypes. Spark's [[Decimal]]
  * does NOT extend java.lang.Number, so a bare
  * `asInstanceOf[Number]` passes analysis on a DECIMAL column and then
  * throws ClassCastException at runtime (ADVICE r10). Every value/weight
  * coercion routes through here instead.
  */
object Num {
  def toD(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case other =>
      throw new IllegalArgumentException(s"expected a numeric value, got $other (${other.getClass})")
  }

  def toL(v: Any): Long = v match {
    case d: Decimal => d.toLong
    case n: java.lang.Number => n.longValue()
    case other =>
      throw new IllegalArgumentException(s"expected a numeric value, got $other (${other.getClass})")
  }

  def toI(v: Any): Int = v match {
    case d: Decimal => d.toInt
    case n: java.lang.Number => n.intValue()
    case other =>
      throw new IllegalArgumentException(s"expected a numeric value, got $other (${other.getClass})")
  }
}
