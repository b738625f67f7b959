package graft.operators

import graft.operators.{SelfQueryFilter => F}

/** Parser for the LangChain structured-query WIRE format — the actual
  * payload the reference's self-query LLM emits (SURVEY.md §3 EP2; the
  * reference wires `SelfQueryRetriever` + `MyScaleTranslator` in
  * `app/backend/construct/build_retrievers.py:48-60`, and LangChain's
  * public prompt makes the model answer with a fenced JSON envelope):
  *
  * {{{
  * ```json
  * {
  *     "query": "neural networks",
  *     "filter": "and(eq(\"lang\", \"en\"), gt(\"n_chars\", 300))"
  * }
  * ```
  * }}}
  *
  * `filter` is a function-call expression over comparators
  * `eq|ne|gt|gte|lt|lte|contain|like|in` and operators `and|or|not`
  * (exactly the comparator set the reference enables,
  * `docs/self-query.md:161-178`), or the literal `NO_FILTER`.
  *
  * Round 1 exposed the filter AST programmatically ([[SelfQueryFilter]]);
  * this adds the missing deserialization step so a caller can hand the raw
  * LLM text straight to the engine. Values matching `yyyy-MM-dd` (with an
  * optional `HH:mm[:ss[.S]]` time part) become timestamp literals —
  * mirroring the translator's `parseDateTimeBestEffort` rendering for
  * timestamp-typed attributes.
  */
object SelfQueryParser {

  final case class Request(query: String, filter: Option[F.Node])

  private val DateRe =
    """\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?""".r

  /** Parse the full LLM response: optional markdown fences, JSON envelope,
    * filter expression. Throws IllegalArgumentException on malformed input.
    */
  def parseRequest(raw: String): Request = {
    val body = stripFences(raw.trim)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(body)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"bad JSON envelope: ${e.getMessage}") }
    val query = Option(root.get("query")).filterNot(_.isNull).map(_.asText()).getOrElse("")
    // NB Jackson returns NullNode (not Java null) for `"filter": null` —
    // a payload LangChain models do emit alongside the NO_FILTER sentinel
    val filter = Option(root.get("filter")).filterNot(_.isNull).map(_.asText()) match {
      case None | Some("NO_FILTER") | Some("") => None
      case Some(expr)                          => Some(parseFilter(expr))
    }
    Request(query, filter)
  }

  private def stripFences(s: String): String = {
    val fence = """(?s)```(?:json)?\s*(.*?)\s*```""".r
    fence.findFirstMatchIn(s).map(_.group(1)).getOrElse(s)
  }

  /** Parse just the filter expression (`and(eq("a", 1), ...)`). */
  def parseFilter(expr: String): F.Node = {
    val p = new Parser(expr)
    val node = p.parseNode()
    p.skipWs()
    require(p.atEnd, s"trailing input at ${p.pos}: '${expr.drop(p.pos)}'")
    node
  }

  private final class Parser(val s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (!atEnd && s(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at $pos in: $s")

    private def expect(c: Char): Unit = {
      skipWs()
      if (atEnd || s(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    private def ident(): String = {
      skipWs()
      val start = pos
      while (!atEnd && (s(pos).isLetter || s(pos) == '_')) pos += 1
      if (pos == start) fail("expected identifier")
      s.substring(start, pos)
    }

    def parseNode(): F.Node = {
      val fn = ident().toLowerCase
      expect('(')
      val node = fn match {
        case "and" => F.And(parseNodeList())
        case "or"  => F.Or(parseNodeList())
        case "not" => F.Not(parseNode())
        case cmp   => parseComparison(cmp)
      }
      expect(')')
      node
    }

    private def parseNodeList(): Seq[F.Node] = {
      val out = scala.collection.mutable.ArrayBuffer(parseNode())
      skipWs()
      while (!atEnd && s(pos) == ',') { pos += 1; out += parseNode(); skipWs() }
      out.toSeq
    }

    private def parseComparison(cmp: String): F.Node = {
      val attr = stringLit()
      expect(',')
      cmp match {
        case "eq"      => F.Eq(attr, value())
        case "ne"      => F.Ne(attr, value())
        case "gt"      => F.Gt(attr, value())
        case "gte"     => F.Gte(attr, value())
        case "lt"      => F.Lt(attr, value())
        case "lte"     => F.Lte(attr, value())
        case "contain" => F.Contain(attr, value())
        case "like"    => value() match {
          case F.S(p) => F.Like(attr, p)
          case other  => fail(s"like pattern must be a string, got $other")
        }
        case "in"      => F.In(attr, valueList())
        case other     => fail(s"unknown comparator '$other'")
      }
    }

    private def stringLit(): String = {
      skipWs()
      if (atEnd || s(pos) != '"') fail("expected string literal")
      pos += 1
      val sb = new StringBuilder
      while (!atEnd && s(pos) != '"') {
        if (s(pos) == '\\' && pos + 1 < s.length) { sb += s(pos + 1); pos += 2 }
        else { sb += s(pos); pos += 1 }
      }
      if (atEnd) fail("unterminated string")
      pos += 1
      sb.toString
    }

    private def valueList(): Seq[F.Value] = {
      skipWs()
      expect('[')
      val out = scala.collection.mutable.ArrayBuffer(value())
      skipWs()
      while (!atEnd && s(pos) == ',') { pos += 1; out += value(); skipWs() }
      expect(']')
      out.toSeq
    }

    def value(): F.Value = {
      skipWs()
      if (atEnd) fail("expected value")
      s(pos) match {
        case '"' =>
          val str = stringLit()
          if (DateRe.matches(str)) F.T(str) else F.S(str)
        case c if c.isDigit || c == '-' || c == '+' =>
          val start = pos
          pos += 1
          while (!atEnd && (s(pos).isDigit || s(pos) == '.' || s(pos) == 'e' ||
            s(pos) == 'E' || s(pos) == '-' || s(pos) == '+')) pos += 1
          val num = s.substring(start, pos)
          if (num.exists(c => c == '.' || c == 'e' || c == 'E')) F.D(num.toDouble)
          else F.I(num.toLong)
        case 't' | 'f' | 'T' | 'F' =>
          val id = ident()
          id.toLowerCase match {
            case "true"  => F.B(true)
            case "false" => F.B(false)
            case other   => fail(s"unexpected bare word '$other'")
          }
        case other => fail(s"unexpected value start '$other'")
      }
    }
  }
}
