package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The self-query structured-filter DSL (SURVEY.md §2.2 P5, §3 EP2).
  *
  * The reference configures a LangChain `SelfQueryRetriever` whose LLM
  * emits a comparator/operator AST that `MyScaleTranslator` renders to a
  * SQL WHERE string (`app/backend/construct/build_retrievers.py:48-60`;
  * comparator semantics `docs/self-query.md:161-178`: eq/ne/gt/gte/lt/lte
  * extended with contain + like, combined with and/or/not; timestamp
  * values rendered via parseDateTimeBestEffort, list membership via
  * `has`).
  *
  * Spark-native: the AST is a first-class ADT compiled to a `Column`
  * predicate — no string surgery. Catalyst then pushes the predicate below
  * the k-NN sort exactly like MyScale's PREWHERE (§2.2 P3): filter first,
  * distance only on survivors.
  */
object SelfQueryFilter {

  sealed trait Value { def toColumn: Column }
  final case class S(v: String) extends Value { def toColumn: Column = lit(v) }
  final case class I(v: Long) extends Value { def toColumn: Column = lit(v) }
  final case class D(v: Double) extends Value { def toColumn: Column = lit(v) }
  final case class B(v: Boolean) extends Value { def toColumn: Column = lit(v) }
  /** Timestamp literal, parsed best-effort like the reference's translator
    * (`parseDateTimeBestEffort('2021-01-01')`, prompts.py:100). */
  final case class T(v: String) extends Value {
    def toColumn: Column = to_timestamp(lit(v))
  }

  sealed trait Node
  final case class Eq(attr: String, v: Value) extends Node
  final case class Ne(attr: String, v: Value) extends Node
  final case class Gt(attr: String, v: Value) extends Node
  final case class Gte(attr: String, v: Value) extends Node
  final case class Lt(attr: String, v: Value) extends Node
  final case class Lte(attr: String, v: Value) extends Node
  /** `contain` — array column contains scalar (MyScale renders `has()`). */
  final case class Contain(attr: String, v: Value) extends Node
  /** `like` — SQL LIKE pattern (MyScale extension comparator). */
  final case class Like(attr: String, pattern: String) extends Node
  final case class In(attr: String, vs: Seq[Value]) extends Node
  final case class And(children: Seq[Node]) extends Node
  final case class Or(children: Seq[Node]) extends Node
  final case class Not(child: Node) extends Node

  object And { def of(ns: Node*): And = And(ns.toSeq) }
  object Or { def of(ns: Node*): Or = Or(ns.toSeq) }

  /** Compile the filter AST to a Catalyst predicate `Column`. */
  def compile(node: Node): Column = node match {
    case Eq(a, v)      => col(a) === v.toColumn
    case Ne(a, v)      => col(a) =!= v.toColumn
    case Gt(a, v)      => col(a) > v.toColumn
    case Gte(a, v)     => col(a) >= v.toColumn
    case Lt(a, v)      => col(a) < v.toColumn
    case Lte(a, v)     => col(a) <= v.toColumn
    case Contain(a, v) => array_contains(col(a), v.toColumn)
    case Like(a, p)    => col(a).like(p)
    case In(a, vs)     => col(a).isin(vs.map(_.toColumn): _*)
    case And(cs)       => cs.map(compile).reduce(_ && _)
    case Or(cs)        => cs.map(compile).reduce(_ || _)
    case Not(c)        => !compile(c)
  }

  /** Render the same AST as an ANSI SQL WHERE fragment (used to build
    * DuckDB oracle text; mirrors what MyScaleTranslator does for the
    * reference's engine).
    */
  def toSql(node: Node): String = {
    def v2s(v: Value): String = v match {
      case S(s) => "'" + s.replace("'", "''") + "'"
      case I(i) => i.toString
      case D(d) => d.toString
      case B(b) => b.toString.toUpperCase
      case T(t) => s"TIMESTAMP '$t'"
    }
    node match {
      case Eq(a, v)      => s"($a = ${v2s(v)})"
      case Ne(a, v)      => s"($a <> ${v2s(v)})"
      case Gt(a, v)      => s"($a > ${v2s(v)})"
      case Gte(a, v)     => s"($a >= ${v2s(v)})"
      case Lt(a, v)      => s"($a < ${v2s(v)})"
      case Lte(a, v)     => s"($a <= ${v2s(v)})"
      case Contain(a, v) => s"list_contains($a, ${v2s(v)})"
      case Like(a, p)    => s"($a LIKE '${p.replace("'", "''")}')"
      case In(a, vs)     => s"($a IN (${vs.map(v2s).mkString(", ")}))"
      case And(cs)       => cs.map(toSql).mkString("(", " AND ", ")")
      case Or(cs)        => cs.map(toSql).mkString("(", " OR ", ")")
      case Not(c)        => s"(NOT ${toSql(c)})"
    }
  }
}
