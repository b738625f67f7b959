package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** ClickHouse tuple arithmetic (`tuplePlus`/`tupleMinus`/`tupleMultiply`/
  * `tupleDivide`/`tupleNegate`/`tupleHammingDistance`) over Spark
  * structs. Arithmetic outputs DOUBLE fields (one rule, no per-type
  * promotion table); hamming compares fields generically. Field-wise
  * loops are structural (arity known only at analysis), so these are
  * CodegenFallback — tuples in this dialect are few-field presentation
  * values, not hot-path columns.
  */
case class TupleArith(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = s"tuple_$op"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StructType(a), StructType(b))
        if a.length == b.length &&
          (a ++ b).forall(_.dataType.isInstanceOf[NumericType]) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two numeric tuples of one arity, got ($a, $b)")
    }

  override def dataType: DataType = StructType(
    left.dataType.asInstanceOf[StructType].fields.map(f =>
      f.copy(dataType = DoubleType, nullable = false)))

  private lazy val ltypes = left.dataType.asInstanceOf[StructType].fields.map(_.dataType)
  private lazy val rtypes = right.dataType.asInstanceOf[StructType].fields.map(_.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[InternalRow]
    val rb = b.asInstanceOf[InternalRow]
    val n = ltypes.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val x = Num.toD(ra.get(i, ltypes(i)))
      val y = Num.toD(rb.get(i, rtypes(i)))
      out(i) = op match {
        case "plus" => x + y
        case "minus" => x - y
        case "multiply" => x * y
        case "divide" => x / y // IEEE: /0 -> Inf, CH's double semantics
        case other => throw new IllegalArgumentException(s"tuple op $other")
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class TupleNegate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "tuple_negate"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(f) if f.forall(_.dataType.isInstanceOf[NumericType]) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tupleNegate expects a numeric tuple, got $t")
  }

  override def dataType: DataType = StructType(
    child.dataType.asInstanceOf[StructType].fields.map(f =>
      f.copy(dataType = DoubleType, nullable = false)))

  private lazy val types = child.dataType.asInstanceOf[StructType].fields.map(_.dataType)

  protected override def nullSafeEval(v: Any): Any = {
    val r = v.asInstanceOf[InternalRow]
    val out = new Array[Any](types.length)
    var i = 0
    while (i < types.length) { out(i) = -Num.toD(r.get(i, types(i))); i += 1 }
    new GenericInternalRow(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Count of differing fields (generic equality; NULL == NULL). */
case class TupleHammingDistance(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "tuple_hamming_distance"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StructType(a), StructType(b)) if a.length == b.length &&
        a.zip(b).forall { case (x, y) => x.dataType.sameType(y.dataType) } =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"tupleHammingDistance expects two tuples of one shape, got ($a, $b)")
    }

  private lazy val types = left.dataType.asInstanceOf[StructType].fields.map(_.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[InternalRow]
    val rb = b.asInstanceOf[InternalRow]
    var d = 0
    var i = 0
    while (i < types.length) {
      val x = if (ra.isNullAt(i)) null else ra.get(i, types(i))
      val y = if (rb.isNullAt(i)) null else rb.get(i, types(i))
      val eq = (x == null && y == null) || (x != null && x == y)
      if (!eq) d += 1
      i += 1
    }
    d
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
