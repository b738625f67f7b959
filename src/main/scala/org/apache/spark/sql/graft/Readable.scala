package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse presentation/parsing helpers: `formatReadableSize` (IEC
  * binary units), `formatReadableQuantity` (thousands/millions/...),
  * `bar` (block-character gauge with eighth-block partials — CH's
  * rendering), and `extractKeyValuePairs` (the default-delimiter form:
  * ':' between key and value, ',' / ' ' / ';' between pairs).
  */
object ReadableOps {
  private val SizeUnits = Array("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
  private val QtyUnits = Array("", " thousand", " million", " billion", " trillion", " quadrillion")

  /** Two decimals, HALF_EVEN on the exact binary value — what C/{fmt}
    * printf does (and hence ClickHouse); Java's %.2f is HALF_UP and
    * diverges on dyadic halves like 703.125, which /1024 produces.
    */
  private def fmt2(v: Double): String =
    new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** CH prints 'inf'/'-inf'/'nan' for non-finite inputs; without this
    * guard fmt2's BigDecimal(v) throws NumberFormatException and kills
    * the whole query on a single bad double (ADVICE r10).
    */
  private def nonFinite(x: Double): String =
    if (x.isNaN) "nan" else if (x > 0) "inf" else "-inf"

  def formatReadableSize(x: Double): UTF8String = {
    if (!java.lang.Double.isFinite(x)) return UTF8String.fromString(nonFinite(x))
    var v = math.abs(x)
    var u = 0
    while (v >= 1024.0 && u < SizeUnits.length - 1) { v /= 1024.0; u += 1 }
    val sign = if (x < 0) "-" else ""
    UTF8String.fromString(s"$sign${fmt2(v)} ${SizeUnits(u)}")
  }

  def formatReadableQuantity(x: Double): UTF8String = {
    if (!java.lang.Double.isFinite(x)) return UTF8String.fromString(nonFinite(x))
    var v = math.abs(x)
    var u = 0
    while (v >= 1000.0 && u < QtyUnits.length - 1) { v /= 1000.0; u += 1 }
    val sign = if (x < 0) "-" else ""
    UTF8String.fromString(s"$sign${fmt2(v)}${QtyUnits(u)}")
  }

  private val DecUnits = Array("B", "KB", "MB", "GB", "TB", "PB", "EB")

  /** CH formatReadableDecimalSize: 1000-based units, same 2-decimal
    * HALF_EVEN formatting as the IEC variant.
    */
  def formatReadableDecimalSize(x: Double): UTF8String = {
    if (!java.lang.Double.isFinite(x)) return UTF8String.fromString(nonFinite(x))
    var v = math.abs(x)
    var u = 0
    while (v >= 1000.0 && u < DecUnits.length - 1) { v /= 1000.0; u += 1 }
    val sign = if (x < 0) "-" else ""
    UTF8String.fromString(s"$sign${fmt2(v)} ${DecUnits(u)}")
  }

  /** CH formatReadableTimeDelta (day-capped subset: days/hours/minutes/
    * seconds — CH's default max unit is years with 365-day years; this
    * covers the monitoring shape without inventing calendar arithmetic).
    * Matches CH's phrasing: comma-separated, singular/plural units,
    * fractional seconds printed as-is.
    */
  def formatReadableTimeDelta(x: Double): UTF8String = {
    if (!java.lang.Double.isFinite(x)) return UTF8String.fromString(nonFinite(x))
    val neg = x < 0
    var rem = math.abs(x)
    val parts = new scala.collection.mutable.ArrayBuffer[String](4)
    def emit(n: Long, unit: String): Unit =
      if (n > 0) parts += s"$n $unit" + (if (n == 1) "" else "s")
    val days = (rem / 86400.0).toLong; rem -= days * 86400.0
    val hours = (rem / 3600.0).toLong; rem -= hours * 3600.0
    val mins = (rem / 60.0).toLong; rem -= mins * 60.0
    emit(days, "day"); emit(hours, "hour"); emit(mins, "minute")
    if (rem > 0 || parts.isEmpty) {
      val s =
        if (rem == math.rint(rem)) rem.toLong.toString
        else rem.toString
      parts += s"$s second" + (if (s == "1") "" else "s")
    }
    UTF8String.fromString((if (neg) "-" else "") + parts.mkString(", "))
  }

  private val Eighths = Array("", "▏", "▎", "▍", "▌",
    "▋", "▊", "▉")

  /** CH bar(): width·(x−min)/(max−min) full blocks, then an eighth-block
    * partial (rounded to the nearest eighth).
    */
  def bar(x: Double, min: Double, max: Double, width: Double): UTF8String = {
    if (max <= min || width <= 0) return UTF8String.fromString("")
    val v = math.max(0.0, math.min(width, width * (x - min) / (max - min)))
    val full = v.toInt
    val frac = math.round((v - full) * 8).toInt
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < full) { sb.append('█'); i += 1 }
    if (frac >= 8) sb.append('█')
    else if (frac > 0) sb.append(Eighths(frac))
    UTF8String.fromString(sb.toString)
  }

  private val KvPattern =
    java.util.regex.Pattern.compile("([^,;:\\s]+)\\s*:\\s*([^,;\\s]*)")

  /** Default-delimiter key-value extraction: a pair is `key:value` with
    * optional whitespace around ':'; values run to the next ','/';'/
    * whitespace; empty keys impossible by construction; the LAST
    * occurrence of a duplicate key wins (CH keeps one).
    */
  def extractKeyValuePairs(s: UTF8String): (Array[UTF8String], Array[UTF8String]) = {
    val text = s.toString
    val out = new java.util.LinkedHashMap[String, String]()
    val m = KvPattern.matcher(text)
    while (m.find()) out.put(m.group(1), m.group(2))
    val keys = new Array[UTF8String](out.size())
    val vals = new Array[UTF8String](out.size())
    val it = out.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = UTF8String.fromString(e.getValue)
      i += 1
    }
    (keys, vals)
  }
}

case class FormatReadableSize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "format_readable_size"
  protected override def nullSafeEval(v: Any): Any =
    ReadableOps.formatReadableSize(v.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ReadableOps.formatReadableSize($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class FormatReadableQuantity(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "format_readable_quantity"
  protected override def nullSafeEval(v: Any): Any =
    ReadableOps.formatReadableQuantity(v.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ReadableOps.formatReadableQuantity($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class BarExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bar"
  protected override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    ReadableOps.bar(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"org.apache.spark.sql.graft.ReadableOps.bar($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** `extractKeyValuePairs(s)` → map<string,string> (default delimiters). */
case class ExtractKeyValuePairs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_key_value_pairs"
  protected override def nullSafeEval(v: Any): Any = {
    val (k, vals) = ReadableOps.extractKeyValuePairs(v.asInstanceOf[UTF8String])
    new ArrayBasedMapData(new GenericArrayData(k.asInstanceOf[Array[Any]]),
      new GenericArrayData(vals.asInstanceOf[Array[Any]]))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
