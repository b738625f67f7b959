package org.apache.spark.sql.graft

import graft.functions.HashEmbedder

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `NeuralArray(entity)` — the Vector-SQL text-to-embedding function
  * (reference `app/backend/constants/prompts.py:34`; semantics: the app
  * substitutes the embedding array *before* shipping SQL to the engine,
  * `docs/vector-sql.md:77-93`, `app/backend/construct/build_retrievers.py:87-91`).
  *
  * Spark-native version: a deterministic, foldable expression. With a
  * literal argument (the only form the reference produces), Catalyst's
  * `ConstantFolding` collapses it to an `Array[Float]` literal during
  * optimization — the distributed scan never re-embeds per row, which is
  * exactly the reference's substitute-then-execute behavior.
  */
case class NeuralArray(child: Expression, dim: Int = HashEmbedder.DefaultDim)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "neural_array"

  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(
      HashEmbedder.embed(s.asInstanceOf[UTF8String].toString, dim)
        .map(java.lang.Float.valueOf))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `parseDateTimeBestEffort(s)` — ClickHouse best-effort datetime parsing
  * (emitted by the reference's self-query translator for timestamp filters
  * and taught in its SQL prompt: `app/backend/constants/prompts.py:100`,
  * `docs/vector-sql.md:204`).
  *
  * Spark has no direct equivalent (`to_timestamp` takes one format), so
  * this is a cascade over the formats the reference's data actually
  * exercises: ISO date-time (with/without 'T', optional fraction), bare
  * date, slash dates, and unix epoch seconds. Returns TimestampType
  * (microseconds); null only for null input; unparseable input throws —
  * matching ClickHouse, which errors rather than returning NULL (the OrNull
  * variant is [[ParseDateTimeBestEffortOrNull]]).
  */
case class ParseDateTimeBestEffort(child: Expression, orNull: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TimestampType
  override def nullIntolerant: Boolean = true
  /** The OrNull variant produces null from NON-null input, so it must
    * advertise nullability regardless of the child — otherwise the row
    * converter trusts the non-null schema and reads an uninitialized
    * value instead of the null bit (observed: epoch-0 timestamps).
    */
  override def nullable: Boolean = orNull || child.nullable
  override def prettyName: String =
    if (orNull) "parse_datetime_best_effort_or_null" else "parse_datetime_best_effort"

  override def nullSafeEval(s: Any): Any = {
    val micros = ParseDateTimeBestEffort.parseMicros(s.asInstanceOf[UTF8String].toString)
    micros match {
      case Some(m) => java.lang.Long.valueOf(m)
      case None if orNull => null
      case None =>
        throw new IllegalArgumentException(
          s"parseDateTimeBestEffort: cannot parse '$s' as a datetime")
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ParseDateTimeBestEffort {
  private val dateTimeFormats = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS]"),
    DateTimeFormatter.ofPattern("yyyy/MM/dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("dd/MM/yyyy HH:mm:ss"))
  private val dateFormats = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd"),
    DateTimeFormatter.ofPattern("yyyy/MM/dd"),
    DateTimeFormatter.ofPattern("yyyyMMdd"),
    DateTimeFormatter.ofPattern("dd/MM/yyyy"))

  /** Microseconds since epoch (UTC), or None if no format matches. */
  def parseMicros(raw: String): Option[Long] = {
    val s = raw.trim
    if (s.isEmpty) return None
    // unix epoch seconds (ClickHouse accepts 9-10 digit integers)
    if (s.length >= 9 && s.length <= 10 && s.forall(_.isDigit))
      return Some(s.toLong * 1000000L)
    dateTimeFormats.foreach { f =>
      try return Some(LocalDateTime.parse(s, f).toInstant(ZoneOffset.UTC).toEpochMilli * 1000L)
      catch { case _: Exception => }
    }
    dateFormats.foreach { f =>
      try return Some(LocalDate.parse(s, f).atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L)
      catch { case _: Exception => }
    }
    None
  }
}

/** ClickHouse `length` is overloaded over strings AND arrays
  * (reference uses both: `length(categories) > 2` on an array at
  * `app/backend/constants/prompts.py:82` and `length(vector) = 768` /
  * `length(text)` at `private_knowledge_base.py:29,75`). Spark splits this
  * into `length` (string) and `size` (array); this RuntimeReplaceable
  * dispatches on the resolved child type so the Vector-SQL dialect keeps
  * the single name. Replacement happens at analysis, so codegen sees the
  * native Length/Size expressions.
  */
case class ChLength(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override def prettyName: String = "ch_length"
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case BinaryType                => Length(child)
    case _                        => Length(child)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `term_tfs(tokens)` — (term, tf) pairs for one document's token array:
  * sort + run-length count in a single JVM call per ROW. Exists because
  * computing tf in the narrow map stage (it is a purely per-document
  * quantity) lets [[graft.operators.Bm25Index.build]] drop its
  * tokens-sized explode→groupBy shuffle, and Catalyst's higher-order
  * functions can't express this efficiently — transform/filter evaluate
  * interpreted per ELEMENT (O(distinct·dl) Catalyst evals per doc,
  * measured 2.2× slower than the shuffle it replaced), while this is one
  * fallback eval per doc doing O(dl log dl) primitive work. Output order
  * is the sorted term order; consumers treat it as a set.
  */
case class TermTfs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType, containsNull = false))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "term_tfs"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(toks, null) // UTF8String is Comparable
    val out = new java.util.ArrayList[Any](math.min(n, 64))
    var start = 0
    i = 1
    while (i <= n) {
      if (i == n || toks(i).compareTo(toks(start)) != 0) {
        out.add(org.apache.spark.sql.catalyst.InternalRow(toks(start), i - start))
        start = i
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column wrappers for the text expressions used directly from Scala. */
object TextFunctions {
  import org.apache.spark.sql.Column
  import Bridge.{toColumn, toExpr}
  def term_tfs(tokens: Column): Column = toColumn(TermTfs(toExpr(tokens)))
}
