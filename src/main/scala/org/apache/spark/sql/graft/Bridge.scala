package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column(Expression)` and friends `private[sql]`; graft's
  * Catalyst-level glue therefore lives in this `org.apache.spark.sql.graft`
  * package (standard extension-library pattern). Single choke point — the
  * public `graft.*` API never touches the classic backend directly.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression   = ExpressionUtils.expression(c)
}
