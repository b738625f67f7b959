package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** ClickHouse SQL TEXT compatibility: accept the clause-level CH-isms the
  * reference's LLM emits as raw SQL — `PREWHERE`, `LIMIT n BY cols`,
  * `SAMPLE k/n [OFFSET m/n]`, `GROUP BY ... WITH TOTALS`, trailing
  * `FORMAT X` / `SETTINGS ...`, `GLOBAL IN/JOIN`, `==` — by rewriting
  * them onto standard Spark SQL before parsing. Two entry points share
  * one rewriter:
  *
  *   - [[ChSql.sql]] — imperative (`ChSql.sql(spark, text)`), works on
  *     any session including the driver's;
  *   - `graft.plans.GraftExtensions` injects a delegating parser, so
  *     sessions built with `spark.sql.extensions` accept the dialect
  *     directly through `spark.sql(text)`.
  *
  * The rewriter is a real TOKENIZER (quotes, comments, nesting depth),
  * not regexes — a clause inside a string literal is never touched, and
  * anything out of scope fails LOUDLY rather than mis-rewriting:
  * `WITH FILL` points to SelectDialect.withFill (spine generation needs
  * a plan, not a text edit), `LIMIT BY` inside a subquery is rejected,
  * `SAMPLE` requires a registered sampling key (CH reads it from the
  * table DDL; graft registers it via [[ChSql.registerSampleKey]]).
  *
  * Semantics mapping (all gated q220/q221):
  *   - PREWHERE p [WHERE w]  →  WHERE (p) [AND (w)] — PREWHERE is CH's
  *     early-filter hint; Spark's optimizer already pushes predicates to
  *     the scan, so the hint's WORK is native and only the word needs
  *     translating.
  *   - LIMIT n BY c1..ck  →  row_number() window over (c1..ck) ordered
  *     by the query's ORDER BY (or the BY columns), kept <= n — the
  *     SelectDialect.limitBy plan, produced from text.
  *   - SAMPLE k/n [OFFSET m/n]  →  the deterministic key-hash bucket
  *     predicate of SelectDialect.sampleByKey, injected as a PREWHERE
  *     (which then merges into WHERE).
  *   - SETTINGS max_threads / max_memory_usage  →  a per-STATEMENT Spark
  *     conf scope on the executing entry point (shuffle.partitions /
  *     autoBroadcastJoinThreshold; set for the statement, restored
  *     after — the statement executes eagerly inside the scope). Other
  *     settings names are stripped and recorded, as before.
  */
object ChSql {

  // ---- lexer ----------------------------------------------------------

  private[operators] final val WS = 0
  private[operators] final val WORD = 1
  private[operators] final val NUM = 2
  private[operators] final val STR = 3
  private[operators] final val SYM = 4

  private[operators] final case class Tok(text: String, kind: Int, depth: Int) {
    def isWord(w: String): Boolean = kind == WORD && text.equalsIgnoreCase(w)
  }

  private[operators] def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var depth = 0
    val n = s.length
    def isWordStart(c: Char) = c.isLetter || c == '_'
    def isWordPart(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) {
        val j = i
        while (i < n && s.charAt(i).isWhitespace) i += 1
        out += Tok(s.substring(j, i), WS, depth)
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        val j = i
        while (i < n && s.charAt(i) != '\n') i += 1
        out += Tok(s.substring(j, i), WS, depth)
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val j = i
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        out += Tok(s.substring(j, i), WS, depth)
      } else if (c == '\'') {
        val j = i
        i += 1
        var done = false
        while (i < n && !done) {
          val d = s.charAt(i)
          if (d == '\\' && i + 1 < n) i += 2
          else if (d == '\'' && i + 1 < n && s.charAt(i + 1) == '\'') i += 2
          else if (d == '\'') { i += 1; done = true }
          else i += 1
        }
        out += Tok(s.substring(j, i), STR, depth)
      } else if (c == '"' || c == '`') {
        val q = c
        val j = i
        i += 1
        while (i < n && s.charAt(i) != q) i += 1
        i = math.min(n, i + 1)
        out += Tok(s.substring(j, i), STR, depth)
      } else if (isWordStart(c)) {
        val j = i
        while (i < n && isWordPart(s.charAt(i))) i += 1
        out += Tok(s.substring(j, i), WORD, depth)
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val j = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
          s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
          ((s.charAt(i) == '+' || s.charAt(i) == '-') && i > j &&
            (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        out += Tok(s.substring(j, i), NUM, depth)
      } else if (c == '(') {
        depth += 1
        out += Tok("(", SYM, depth) // the paren carries the INNER depth
        i += 1
      } else if (c == ')') {
        out += Tok(")", SYM, depth)
        depth -= 1
        i += 1
      } else {
        // multi-char symbols first
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Seq("==", "<=", ">=", "!=", "<>", "||", "::", "->").contains(two)) {
          out += Tok(two, SYM, depth)
          i += 2
        } else {
          out += Tok(c.toString, SYM, depth)
          i += 1
        }
      }
    }
    out.result()
  }

  private[operators] def render(toks: Seq[Tok]): String = toks.map(_.text).mkString

  private[operators] def nextNonWs(toks: Vector[Tok], from: Int): Int = {
    var i = from
    while (i < toks.length && toks(i).kind == WS) i += 1
    i
  }

  private[operators] def prevNonWs(toks: Vector[Tok], from: Int): Int = {
    var i = from
    while (i >= 0 && toks(i).kind == WS) i -= 1
    i
  }

  /** Clause-boundary keywords that terminate a predicate at its depth. */
  private val Stops = Set("WHERE", "PREWHERE", "GROUP", "HAVING", "ORDER",
    "LIMIT", "UNION", "INTERSECT", "EXCEPT", "SETTINGS", "WINDOW", "QUALIFY",
    "FORMAT")

  private def stopIndex(toks: Vector[Tok], from: Int, depth: Int): Int = {
    var i = from
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == SYM && t.text == ")" && t.depth == depth) return i
      if (t.kind == WORD && t.depth == depth &&
        Stops.contains(t.text.toUpperCase)) return i
      i += 1
    }
    toks.length
  }

  // ---- passes ---------------------------------------------------------

  /** Trailing `FORMAT X` and `SETTINGS ...` at depth 0 are CH transport/
    * tuning directives with no Spark PLAN meaning — removed from the
    * statement text. The format is returned so a caller can route the
    * WRITER (SourceCatalog owns the format implementations); the
    * settings pairs are returned so the EXECUTING entry point can map
    * the ones with a faithful Spark analog onto a per-statement conf
    * scope ([[ChSql.sql]]; unmapped names are recorded and dropped).
    */
  private def stripTail(toks0: Vector[Tok])
      : (Vector[Tok], Option[String], Seq[(String, String)]) = {
    var toks = toks0
    // trailing semicolon
    val last = prevNonWs(toks, toks.length - 1)
    if (last >= 0 && toks(last).text == ";") toks = toks.patch(last, Nil, 1)
    var fmt: Option[String] = None
    val settings = Vector.newBuilder[(String, String)]
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.kind == WORD && t.depth == 0 &&
            t.text.equalsIgnoreCase("FORMAT")) {
          val v = nextNonWs(toks, i + 1)
          // FORMAT must be followed by a bare format word and then end
          if (v < toks.length && toks(v).kind == WORD &&
              nextNonWs(toks, v + 1) >= toks.length) {
            fmt = Some(toks(v).text)
            toks = toks.take(i)
            changed = true
          }
        } else if (t.kind == WORD && t.depth == 0 &&
            t.text.equalsIgnoreCase("SETTINGS")) {
          // only the `SETTINGS name = value` directive shape (a column
          // ALIASED "settings" must not truncate the query)
          val a = nextNonWs(toks, i + 1)
          val b = if (a < toks.length) nextNonWs(toks, a + 1) else toks.length
          if (a < toks.length && toks(a).kind == WORD &&
              b < toks.length && toks(b).text == "=") {
            // parse `name = value [, name = value]*` to end of statement
            var p = a
            var ok = true
            while (ok && p < toks.length) {
              val eq = nextNonWs(toks, p + 1)
              val v = if (eq < toks.length) nextNonWs(toks, eq + 1) else toks.length
              if (toks(p).kind == WORD && eq < toks.length &&
                  toks(eq).text == "=" && v < toks.length &&
                  (toks(v).kind == WORD || toks(v).kind == NUM ||
                    toks(v).kind == STR)) {
                val raw = toks(v).text
                val value = if (toks(v).kind == STR && raw.length >= 2)
                  raw.substring(1, raw.length - 1) else raw
                settings += (toks(p).text.toLowerCase -> value)
                val c = nextNonWs(toks, v + 1)
                if (c < toks.length && toks(c).text == ",")
                  p = nextNonWs(toks, c + 1)
                else { ok = false } // end of list (tail beyond it is CH-only syntax; stripped)
              } else ok = false
            }
            toks = toks.take(i) // SETTINGS ... runs to end of statement
            changed = true
          }
        }
        i += 1
      }
    }
    (toks, fmt, settings.result())
  }

  private def dropGlobal(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    while (i < toks.length) {
      if (toks(i).isWord("GLOBAL")) {
        val j = nextNonWs(toks, i + 1)
        if (j < toks.length && (toks(j).isWord("IN") || toks(j).isWord("NOT") ||
            toks(j).isWord("ANY") || toks(j).isWord("ALL") ||
            toks(j).isWord("JOIN") || toks(j).isWord("LEFT") ||
            toks(j).isWord("INNER"))) {
          toks = toks.patch(i, Nil, j - i) // GLOBAL + whitespace
        } else i += 1
      } else i += 1
    }
    toks
  }

  private def eqeq(toks: Vector[Tok]): Vector[Tok] =
    toks.map(t => if (t.kind == SYM && t.text == "==") t.copy(text = "=") else t)

  /** `FROM t [AS a] FINAL` / `JOIN t FINAL` → the keyword strips: graft
    * table views are ALWAYS the merged (FINAL) read — [[graft.operators
    * .ChDdl.view]] dedups ReplacingMergeTree sort keys at registration,
    * so the modifier's work is already done and only the word must go
    * (Spark would parse it as a second alias). Only the exact position
    * CH allows is touched — the bare word directly after a table
    * reference (with optional alias) following FROM/JOIN; a column or
    * alias named `final` anywhere else survives. Divergence, documented:
    * against a temp view that is NOT a merged registration the keyword
    * is a silent no-op (graft has no unmerged read to offer there).
    */
  private def stripFinal(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    while (i < toks.length) {
      if (toks(i).isWord("FROM") || toks(i).isWord("JOIN")) {
        var a = nextNonWs(toks, i + 1)
        // table ref: word [. word]
        if (a < toks.length && (toks(a).kind == WORD || toks(a).kind == STR) &&
            !toks(a).isWord("SELECT")) {
          var e = nextNonWs(toks, a + 1)
          if (e < toks.length && toks(e).text == ".") {
            e = nextNonWs(toks, e + 1)
            if (e < toks.length && toks(e).kind == WORD) e = nextNonWs(toks, e + 1)
          }
          // optional [AS] alias — but a bare FINAL here IS the modifier,
          // not an alias (CH reserves it in this position)
          if (e < toks.length && toks(e).isWord("AS")) {
            e = nextNonWs(toks, e + 1)
            if (e < toks.length && toks(e).kind == WORD) e = nextNonWs(toks, e + 1)
          }
          if (e < toks.length && toks(e).isWord("FINAL") && toks(e).depth == toks(i).depth)
            toks = toks.patch(e, Nil, 1)
        }
      }
      i += 1
    }
    toks
  }

  private def rejectWithFill(toks: Vector[Tok]): Unit = {
    var i = 0
    while (i < toks.length - 1) {
      if (toks(i).isWord("WITH")) {
        val j = nextNonWs(toks, i + 1)
        // `WITH fill AS (...)` / `WITH fill(...)` is a CTE named "fill",
        // not the CH clause — only the clause form is rejected
        val k = if (j < toks.length) nextNonWs(toks, j + 1) else toks.length
        val isCte = k < toks.length &&
          (toks(k).isWord("AS") || toks(k).text == "(")
        if (j < toks.length && toks(j).isWord("FILL") && !isCte)
          throw new UnsupportedOperationException(
            "ORDER BY ... WITH FILL needs spine generation, not a text " +
              "rewrite — use graft.operators.SelectDialect.withFill / " +
              "withFillInterpolate")
      }
      i += 1
    }
  }

  /** Table → sampling key column (the CH `SAMPLE BY` DDL analog). */
  private val sampleKeys = new TrieMap[String, String]
  def registerSampleKey(table: String, keyCol: String): Unit =
    sampleKeys.put(table.toLowerCase, keyCol)

  /** `FROM t [AS a] SAMPLE k/n [OFFSET m/n]` → `PREWHERE <bucket pred>`
    * (merged into WHERE by the prewhere pass).
    */
  private def sampleToPrewhere(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    while (i < toks.length) {
      if (toks(i).isWord("SAMPLE") && {
        // the clause form is always `SAMPLE <num>` — a COLUMN named
        // "sample" (SELECT sample FROM t) must pass through untouched
        val a = nextNonWs(toks, i + 1)
        a < toks.length && toks(a).kind == NUM
      }) {
        val d = toks(i).depth
        // table name: the first word after the nearest same-depth FROM
        var f = i - 1
        while (f >= 0 && !(toks(f).isWord("FROM") && toks(f).depth == d)) f -= 1
        require(f >= 0, "ChSql: SAMPLE without a FROM clause")
        val tIdx = nextNonWs(toks, f + 1)
        require(tIdx < toks.length && toks(tIdx).kind == WORD,
          "ChSql: SAMPLE requires a plain table reference " +
            "(subquery sampling: add the predicate inside the subquery)")
        val table = toks(tIdx).text.toLowerCase
        val key = sampleKeys.getOrElse(table, throw new IllegalArgumentException(
          s"ChSql: no sampling key registered for table '$table' — call " +
            "ChSql.registerSampleKey(table, keyCol) (the CH SAMPLE BY DDL analog)"))
        // parse k/n [OFFSET m/n]
        def fraction(at: Int): (Long, Long, Int) = {
          val a = nextNonWs(toks, at)
          require(a < toks.length && toks(a).kind == NUM,
            "ChSql: SAMPLE expects k/n fractions")
          val slash = nextNonWs(toks, a + 1)
          if (slash < toks.length && toks(slash).text == "/") {
            val b = nextNonWs(toks, slash + 1)
            require(b < toks.length && toks(b).kind == NUM,
              "ChSql: SAMPLE expects k/n fractions")
            (toks(a).text.toLong, toks(b).text.toLong, b + 1)
          } else {
            // decimal ratio like 0.1 → scale to /1000000
            val r = BigDecimal(toks(a).text)
            require(r > 0 && r < 1, s"ChSql: SAMPLE ratio must be in (0,1), got $r")
            ((r * 1000000).toLong, 1000000L, a + 1)
          }
        }
        val (num, den, afterK) = fraction(i + 1)
        var end = afterK
        var off = 0L
        val oIdx = nextNonWs(toks, afterK)
        if (oIdx < toks.length && toks(oIdx).isWord("OFFSET")) {
          val (m, den2, afterO) = fraction(oIdx + 1)
          require(den2 == den,
            s"ChSql: SAMPLE and OFFSET denominators must match ($den vs $den2)")
          off = m
          end = afterO
        }
        require(num > 0 && num < den, "ChSql: SAMPLE k/n requires 0 < k < n")
        // the SelectDialect.sampleByKey arithmetic, as SQL text
        val bucket = s"pmod(pmod(CAST($key AS BIGINT) * 2654435761, " +
          s"4294967296), $den)"
        val lo = off % den
        val hi = lo + num
        val pred =
          if (hi <= den) s"($bucket >= $lo AND $bucket < $hi)"
          else s"($bucket >= $lo OR $bucket < ${hi % den})"
        toks = toks.patch(i,
          lex(s"PREWHERE $pred ").map(t => t.copy(depth = t.depth + d)),
          end - i)
      }
      i += 1
    }
    toks
  }

  /** `[LEFT] ARRAY JOIN e1 AS a1 [, e2 AS a2 ...]` → `LATERAL VIEW
    * explode/posexplode` chain, position-preserving (the clause sits in
    * FROM position in both dialects). Multi-array clauses zip by
    * position like CH: the first array drives via `posexplode`, the
    * rest index into it (`(e)[pos]` — null-pads where CH would error on
    * unequal lengths; documented divergence). `LEFT ARRAY JOIN` keeps
    * empty-array rows via `explode_outer`, yielding NULL elements where
    * CH yields the type default (documented divergence — null is the
    * Spark-native "absent").
    *
    * CH's ALIAS-LESS form (`ARRAY JOIN arr` — the element SHADOWS the
    * source column) is supported for bare columns at statement depth: the
    * element gets a fresh internal alias and the FROM clause is wrapped in
    * a re-projection subquery (`SELECT * EXCEPT (arr), __aj_shN AS arr`),
    * so every outer clause — select list, WHERE, GROUP BY, ORDER BY —
    * sees the ELEMENT under the column's name, exactly CH's scoping. A
    * shadowed `SELECT *` surfaces the element at the END of the schema
    * (CH keeps the original position; documented divergence). Genuinely
    * ambiguous forms stay loud: expression items without an alias, and
    * the shadow form inside a subquery or CTE statement.
    */
  private def arrayJoin(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var uid = 0
    var scan = 0
    val shadows = Vector.newBuilder[(String, String)] // source col -> element alias
    var shadowN = 0
    val posCols = Vector.newBuilder[String] // depth-0 posexplode pos columns
    while (scan < toks.length) {
      val t = toks(scan)
      val isClause = t.isWord("ARRAY") && {
        val j = nextNonWs(toks, scan + 1)
        j < toks.length && toks(j).isWord("JOIN") && toks(j).depth == t.depth
      }
      if (isClause) {
        val d = t.depth
        val jIdx = nextNonWs(toks, scan + 1)
        val p = prevNonWs(toks, scan - 1)
        val isLeft = p >= 0 && toks(p).isWord("LEFT") && toks(p).depth == d
        val start = if (isLeft) p else scan
        // items run to the next same-depth clause keyword / join / ')'
        // join-starter words end the item list only when they BEGIN a
        // join clause (an expression may legitimately contain the word
        // `array`, e.g. `ARRAY JOIN array(a, b) AS x`)
        val joinish = Set("JOIN", "ARRAY", "OUTER", "SEMI", "ANTI")
        def startsJoin(at: Int): Boolean = toks(at).text.toUpperCase match {
          case "JOIN" | "LATERAL" => true
          case "ARRAY" | "LEFT" | "RIGHT" | "INNER" | "FULL" | "CROSS" =>
            val nx = nextNonWs(toks, at + 1)
            nx < toks.length && toks(nx).kind == WORD &&
              joinish.contains(toks(nx).text.toUpperCase)
          case w => Stops.contains(w)
        }
        var end = jIdx + 1
        while (end < toks.length && !(toks(end).depth == d &&
          ((toks(end).kind == SYM && toks(end).text == ")") ||
            (toks(end).kind == WORD && startsJoin(end))))) end += 1
        // split items on same-depth commas
        val items = Vector.newBuilder[(String, String)] // (expr, alias)
        var itemStart = jIdx + 1
        def addItem(upTo: Int): Unit = {
          val item = toks.slice(itemStart, upTo)
          // top-level AS within the item
          val asIdx = item.indexWhere(x => x.depth == d && x.isWord("AS"))
          if (asIdx < 0) {
            // the alias-less shadow form: only a BARE COLUMN at statement
            // depth is resolvable by the re-projection wrapper
            val words = item.filter(_.kind != WS)
            require(words.length == 1 && words.head.kind == WORD,
              "ChSql: ARRAY JOIN expression items need an alias " +
                "(ARRAY JOIN expr AS x) — only a bare column may shadow " +
                "(ARRAY JOIN arr)")
            require(d == 0,
              "ChSql: alias-less ARRAY JOIN inside a subquery is not " +
                "supported — alias the element (ARRAY JOIN arr AS x)")
            val colName = words.head.text
            val alias = s"__aj_sh$shadowN"
            shadowN += 1
            shadows += (colName -> alias)
            items += ((colName, alias))
          } else {
            val expr = render(item.take(asIdx)).trim
            val alias = render(item.drop(asIdx + 1)).trim
            require(expr.nonEmpty && alias.nonEmpty,
              s"ChSql: malformed ARRAY JOIN item '${render(item).trim}'")
            items += ((expr, alias))
          }
        }
        var k = jIdx + 1
        while (k < end) {
          if (toks(k).kind == SYM && toks(k).text == "," && toks(k).depth == d) {
            addItem(k); itemStart = k + 1
          }
          k += 1
        }
        addItem(end)
        val its = items.result()
        val o = if (isLeft) "_outer" else ""
        val text =
          if (its.length == 1) {
            val (e, a) = its.head
            s" LATERAL VIEW explode$o(($e)) __aj$uid AS $a "
          } else {
            val pos = s"__aj_pos$uid"
            if (d == 0) posCols += pos
            val (e0, a0) = its.head
            val headLv = s" LATERAL VIEW posexplode$o(($e0)) __aj$uid AS $pos, $a0 "
            val tailLv = its.tail.zipWithIndex.map { case ((e, a), i) =>
              s"LATERAL VIEW explode(array(($e)[$pos])) __aj${uid}_$i AS $a "
            }.mkString
            headLv + tailLv
          }
        uid += 1
        toks = toks.patch(start, lex(text).map(x => x.copy(depth = x.depth + d)),
          end - start)
        scan = start + 1
      } else scan += 1
    }
    val sh = shadows.result()
    if (sh.isEmpty) return toks
    // shadow wrapper: hold ONLY the FROM clause (with its lateral views)
    // in a subquery that re-projects each element alias onto the shadowed
    // column's name — every outer clause then resolves the element, which
    // is CH's shadowing scope (WHERE/GROUP BY/ORDER BY all see elements)
    val selIdx = nextNonWs(toks, 0)
    require(selIdx < toks.length && toks(selIdx).isWord("SELECT"),
      "ChSql: alias-less ARRAY JOIN expects a plain SELECT statement — " +
        "in CTE forms alias the element (ARRAY JOIN arr AS x)")
    var fi = selIdx + 1
    while (fi < toks.length && !(toks(fi).isWord("FROM") && toks(fi).depth == 0)) fi += 1
    require(fi < toks.length,
      "ChSql: alias-less ARRAY JOIN could not find the FROM clause")
    val fromEnd = stopIndex(toks, fi + 1, 0)
    val selectList = render(toks.slice(selIdx + 1, fi)).trim
    val fromTail = render(toks.slice(fi, fromEnd)).trim // includes FROM
    val rest = render(toks.slice(fromEnd, toks.length)).trim
    // drop the source columns (shadowed), the internal element aliases
    // (re-projected under the source names), and posexplode's pos columns
    val except = (sh.map(_._1) ++ sh.map(_._2) ++ posCols.result()).mkString(", ")
    val reproject = sh.map { case (c, a) => s"$a AS $c" }.mkString(", ")
    lex(s"SELECT $selectList FROM (SELECT * EXCEPT ($except), $reproject " +
      s"$fromTail) __ajsh" + (if (rest.isEmpty) "" else s" $rest"))
  }

  /** `GROUP BY <keys> WITH TOTALS` → `GROUP BY GROUPING SETS ((<keys>),
    * ())` — Spark's (and DuckDB's) native spelling of "the per-group rows
    * plus one grand-total row with NULL keys" (`SelectDialect.withTotals`
    * is the plan form of the same mapping; this is the text form, same
    * NULL-keys convention). `WITH ROLLUP` / `WITH CUBE` pass through —
    * Spark parses those postfixes natively. `HAVING` alongside
    * `WITH TOTALS` is rejected loudly: CH's `totals_mode` setting decides
    * whether the totals row sees HAVING-eliminated groups, which a text
    * rewrite cannot honor — filter in an outer query instead. A CTE
    * named `totals` (`WITH totals AS (...)`) is not the clause and
    * passes through.
    */
  private def withTotals(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var i = 0
    while (i < toks.length) {
      if (toks(i).isWord("WITH")) {
        val j = nextNonWs(toks, i + 1)
        val k = if (j < toks.length) nextNonWs(toks, j + 1) else toks.length
        val isCte = k < toks.length &&
          (toks(k).isWord("AS") || toks(k).text == "(")
        if (j < toks.length && toks(j).isWord("TOTALS") && !isCte) {
          val d = toks(i).depth
          var g = i - 1
          while (g >= 0 && !(toks(g).isWord("GROUP") && toks(g).depth == d)) g -= 1
          require(g >= 0, "ChSql: WITH TOTALS without a GROUP BY")
          val by = nextNonWs(toks, g + 1)
          require(by < toks.length && toks(by).isWord("BY"),
            "ChSql: GROUP not followed by BY")
          require(toks.slice(by + 1, i).forall(t => !(t.depth == d &&
            t.kind == WORD && Stops.contains(t.text.toUpperCase))),
            "ChSql: WITH TOTALS must directly follow its GROUP BY key list")
          // HAVING can only follow the GROUP BY clause it modifies — scan
          // forward within this SELECT block (stop at set-op or ')')
          var h = k
          while (h < toks.length && !(toks(h).depth == d &&
              ((toks(h).kind == SYM && toks(h).text == ")") ||
                toks(h).isWord("UNION") || toks(h).isWord("INTERSECT") ||
                toks(h).isWord("EXCEPT")))) {
            require(!(toks(h).depth == d && toks(h).isWord("HAVING")),
              "ChSql: WITH TOTALS combined with HAVING depends on CH's " +
                "totals_mode — filter in an outer SELECT instead")
            h += 1
          }
          val keys = render(toks.slice(by + 1, i)).trim
          require(keys.nonEmpty, "ChSql: WITH TOTALS needs GROUP BY keys")
          toks = toks.patch(g,
            lex(s"GROUP BY GROUPING SETS (($keys), ()) ")
              .map(t => t.copy(depth = t.depth + d)),
            (k min toks.length) - g)
          i = g
        }
      }
      i += 1
    }
    toks
  }

  private def mergePrewhere(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    var guard = 0
    var found = true
    while (found && guard < 32) {
      found = false
      guard += 1
      var i = 0
      while (i < toks.length && !found) {
        if (toks(i).isWord("PREWHERE")) {
          found = true
          val d = toks(i).depth
          val predEnd = stopIndex(toks, i + 1, d)
          val pred = render(toks.slice(i + 1, predEnd)).trim
          if (predEnd < toks.length && toks(predEnd).depth == d &&
              (toks(predEnd).isWord("WHERE") || toks(predEnd).isWord("PREWHERE"))) {
            // merge with the following WHERE/PREWHERE predicate; a merged
            // PREWHERE pair stays PREWHERE so the loop converges on WHERE
            val kw = if (toks(predEnd).isWord("WHERE")) "WHERE" else "PREWHERE"
            val whereEnd = stopIndex(toks, predEnd + 1, d)
            val wpred = render(toks.slice(predEnd + 1, whereEnd)).trim
            toks = toks.patch(i,
              lex(s"$kw ($pred) AND ($wpred) ").map(t => t.copy(depth = t.depth + d)),
              whereEnd - i)
          } else {
            toks = toks.patch(i,
              lex(s"WHERE ($pred) ").map(t => t.copy(depth = t.depth + d)),
              predEnd - i)
          }
        }
        i += 1
      }
    }
    require(guard < 32, "ChSql: PREWHERE rewrite did not converge")
    toks
  }

  /** Depth-0 `ORDER BY o LIMIT n BY c1..ck [LIMIT m]` → windowed wrap. */
  private def limitBy(toks0: Vector[Tok]): Vector[Tok] = {
    var toks = toks0
    // find LIMIT <n> BY
    var li = -1; var n = ""
    var i = 0
    while (i < toks.length && li < 0) {
      if (toks(i).kind == WORD && toks(i).text.equalsIgnoreCase("LIMIT")) {
        val a = nextNonWs(toks, i + 1)
        val b = if (a < toks.length) nextNonWs(toks, a + 1) else toks.length
        if (a < toks.length && toks(a).kind == NUM &&
            b < toks.length && toks(b).isWord("BY")) {
          require(toks(i).depth == 0,
            "ChSql: LIMIT n BY inside a subquery is not supported — " +
              "rewrite the subquery with SelectDialect.limitBy")
          li = i
          n = toks(a).text
        }
      }
      i += 1
    }
    if (li < 0) return toks
    val byStart = nextNonWs(toks,
      nextNonWs(toks, nextNonWs(toks, li + 1) + 1) + 1)
    val byEnd = stopIndex(toks, byStart, 0)
    val byCols = render(toks.slice(byStart, byEnd)).trim
    // trailing plain LIMIT m (optional)
    var tailLimit = ""
    var afterBy = byEnd
    if (byEnd < toks.length && toks(byEnd).isWord("LIMIT")) {
      val m = nextNonWs(toks, byEnd + 1)
      require(m < toks.length && toks(m).kind == NUM,
        "ChSql: expected LIMIT <m> after LIMIT n BY cols")
      tailLimit = s" LIMIT ${toks(m).text}"
      afterBy = m + 1
    }
    require(nextNonWs(toks, afterBy) >= toks.length,
      "ChSql: LIMIT n BY must be the final clause (after ORDER BY)")
    // depth-0 ORDER BY clause (immediately before the LIMIT BY, if any)
    var oi = -1
    i = 0
    while (i < li) {
      if (toks(i).kind == WORD && toks(i).depth == 0 &&
        toks(i).text.equalsIgnoreCase("ORDER")) oi = i
      i += 1
    }
    val (orderExprs, orderClause, coreEnd) =
      if (oi >= 0) {
        val after = nextNonWs(toks, oi + 1)
        require(after < toks.length && toks(after).isWord("BY"),
          "ChSql: ORDER not followed by BY")
        val oe = render(toks.slice(after + 1, li)).trim
        (oe, s" ORDER BY $oe", oi)
      } else (byCols, "", li)
    // the ORDER BY / BY columns may reference SOURCE columns the user's
    // select list drops (CH allows it); when the query has no GROUP BY,
    // run the window over `SELECT * FROM <from-tail>` so every source
    // column is visible, and re-apply the user's select list outside.
    // With GROUP BY, the post-aggregate rows ARE the source — wrap whole.
    val hasGroup = toks.take(li).exists(t =>
      t.depth == 0 && (t.isWord("GROUP") || t.isWord("HAVING") ||
        t.isWord("DISTINCT")))
    val out =
      if (hasGroup) {
        val core = render(toks.take(coreEnd)).trim
        s"SELECT * EXCEPT (__gb_rn) FROM (" +
          s"SELECT *, row_number() OVER (PARTITION BY $byCols ORDER BY $orderExprs) " +
          s"AS __gb_rn FROM ($core) AS __gb_t) AS __gb_l WHERE __gb_rn <= $n" +
          orderClause + tailLimit
      } else {
        // split depth-0 SELECT <list> FROM <tail>
        val selIdx = nextNonWs(toks, 0)
        require(selIdx < toks.length && toks(selIdx).isWord("SELECT"),
          "ChSql: LIMIT n BY expects a SELECT statement")
        var fi = selIdx + 1
        while (fi < coreEnd && !(toks(fi).isWord("FROM") && toks(fi).depth == 0)) fi += 1
        require(fi < coreEnd, "ChSql: LIMIT n BY could not find the FROM clause")
        val selectList = render(toks.slice(selIdx + 1, fi)).trim
        val fromTail = render(toks.slice(fi, coreEnd)).trim // includes FROM
        s"SELECT $selectList FROM (" +
          s"SELECT *, row_number() OVER (PARTITION BY $byCols ORDER BY $orderExprs) " +
          s"AS __gb_rn $fromTail) AS __gb_l WHERE __gb_rn <= $n" +
          orderClause + tailLimit
      }
    lex(out)
  }

  // ---- WITH FILL (executing entry point only) -------------------------

  /** A parsed depth-0 `ORDER BY axis WITH FILL [FROM a] [TO b] [STEP s]
    * [INTERPOLATE (c, ...)] [LIMIT n]` tail; `inner` is the query with
    * the whole ORDER BY ... tail removed.
    */
  final case class FillSpec(inner: String, axis: String,
    from: Option[String], to: Option[String], step: Option[String],
    interpolate: Seq[String], limit: Option[Int])

  /** Extract the CH `WITH FILL` tail. Only the EXECUTING entry point
    * ([[ChSql.sql]]) honors it — spine generation needs a plan, so the
    * text-only [[ChSql.rewrite]] keeps rejecting the clause loudly (the
    * injected-parser path included). Contract matches
    * SelectDialect.withFillInterpolate: single bare ASC axis, bare
    * INTERPOLATE columns (compounding `AS expr` forms are sequential by
    * definition — rejected), the tail must end the statement (an
    * optional final LIMIT allowed).
    */
  private[operators] def extractFill(text: String): Option[FillSpec] = {
    val toks = lex(text)
    var wi = -1
    var i = 0
    while (i < toks.length && wi < 0) {
      if (toks(i).isWord("WITH") && toks(i).depth == 0) {
        val j = nextNonWs(toks, i + 1)
        val k = if (j < toks.length) nextNonWs(toks, j + 1) else toks.length
        val isCte = k < toks.length &&
          (toks(k).isWord("AS") || toks(k).text == "(")
        if (j < toks.length && toks(j).isWord("FILL") && !isCte) wi = i
      }
      i += 1
    }
    if (wi < 0) return None
    // the ORDER BY this tail modifies
    var oi = wi - 1
    while (oi >= 0 && !(toks(oi).isWord("ORDER") && toks(oi).depth == 0)) oi -= 1
    require(oi >= 0, "ChSql: WITH FILL without a depth-0 ORDER BY")
    val by = nextNonWs(toks, oi + 1)
    require(by < toks.length && toks(by).isWord("BY"),
      "ChSql: ORDER not followed by BY")
    val axisToks = toks.slice(by + 1, wi)
    require(!axisToks.exists(t => t.kind == SYM && t.text == "," && t.depth == 0),
      "ChSql: WITH FILL supports a single ORDER BY axis column")
    require(!axisToks.exists(_.isWord("DESC")),
      "ChSql: WITH FILL DESC axes are not supported — fill ascending and " +
        "ORDER BY ... DESC in an outer SELECT")
    val axis = render(axisToks.filterNot(_.isWord("ASC"))).trim
    require(axis.nonEmpty && lex(axis).count(_.kind != WS) == 1,
      s"ChSql: WITH FILL axis must be a bare column, got '$axis' — " +
        "alias the expression in the SELECT list first")
    // clause tail after FILL
    val stops = Set("FROM", "TO", "STEP", "INTERPOLATE", "LIMIT")
    var p = nextNonWs(toks, nextNonWs(toks, wi + 1) + 1)
    var from: Option[String] = None
    var to: Option[String] = None
    var step: Option[String] = None
    var interpolate = Seq.empty[String]
    var limit: Option[Int] = None
    def exprEnd(q: Int): Int = {
      var e = q
      while (e < toks.length && !(toks(e).kind == WORD && toks(e).depth == 0 &&
        stops.contains(toks(e).text.toUpperCase))) e += 1
      e
    }
    while (p < toks.length) {
      toks(p).text.toUpperCase match {
        case "FROM" =>
          val e = exprEnd(nextNonWs(toks, p + 1))
          from = Some(render(toks.slice(nextNonWs(toks, p + 1), e)).trim); p = e
        case "TO" =>
          val e = exprEnd(nextNonWs(toks, p + 1))
          to = Some(render(toks.slice(nextNonWs(toks, p + 1), e)).trim); p = e
        case "STEP" =>
          val e = exprEnd(nextNonWs(toks, p + 1))
          step = Some(render(toks.slice(nextNonWs(toks, p + 1), e)).trim); p = e
        case "INTERPOLATE" =>
          val open = nextNonWs(toks, p + 1)
          require(open < toks.length && toks(open).text == "(",
            "ChSql: INTERPOLATE needs a (column, ...) list")
          var q = open + 1
          val cols = Vector.newBuilder[String]
          while (q < toks.length && toks(q).text != ")") {
            require(!toks(q).isWord("AS"),
              "ChSql: INTERPOLATE (c AS expr) compounding forms are " +
                "sequential by definition — not supported; bare columns " +
                "carry the last observed value forward")
            if (toks(q).kind == WORD || toks(q).kind == STR)
              cols += { val t = toks(q).text
                if (t.length >= 2 && (t.head == '`' || t.head == '"')) t.substring(1, t.length - 1) else t }
            q += 1
          }
          interpolate = cols.result(); p = nextNonWs(toks, q + 1)
        case "LIMIT" =>
          val n = nextNonWs(toks, p + 1)
          require(n < toks.length && toks(n).kind == NUM,
            "ChSql: expected LIMIT <n> after WITH FILL")
          limit = Some(toks(n).text.toInt)
          p = nextNonWs(toks, n + 1)
          require(p >= toks.length,
            "ChSql: WITH FILL ... LIMIT must end the statement")
        case other => throw new IllegalArgumentException(
          s"ChSql: unexpected token '$other' in WITH FILL tail")
      }
      if (p < toks.length) p = nextNonWs(toks, p)
    }
    Some(FillSpec(render(toks.take(oi)).trim, axis, from, to, step,
      interpolate, limit))
  }

  // ---- public API ----------------------------------------------------

  final case class Rewritten(sql: String, format: Option[String],
    settings: Seq[(String, String)] = Nil)

  def rewriteWithFormat(text: String): Rewritten = {
    val t0 = lex(text)
    rejectWithFill(t0)
    val (t1, fmt, settings) = stripTail(t0)
    val t2 = stripFinal(eqeq(dropGlobal(t1)))
    val t3 = withTotals(arrayJoin(sampleToPrewhere(t2)))
    val t4 = mergePrewhere(t3)
    val t5 = limitBy(t4)
    Rewritten(render(t5), fmt, settings)
  }

  def rewrite(text: String): String = rewriteWithFormat(text).sql

  /** CH settings with a faithful per-statement Spark conf analog
    * (r11 verdict item 4 — carry the tuning INTENT instead of stripping):
    * `max_threads` is CH's per-query parallelism knob → the per-query
    * parallelism conf `spark.sql.shuffle.partitions`; `max_memory_usage`
    * bounds per-query memory → `spark.sql.autoBroadcastJoinThreshold`,
    * the conf that bounds the one memory hazard a single Spark statement
    * can opt into (a broadcast build side). Anything else has no
    * per-statement Spark meaning and is stripped as before.
    */
  private val SettingConfs = Map(
    "max_threads" -> "spark.sql.shuffle.partitions",
    "max_memory_usage" -> "spark.sql.autoBroadcastJoinThreshold")

  /** Observability for specs: the session conf values as READ inside the
    * most recent settings scope (proof the conf was in force during the
    * statement), alongside the raw pairs that had no mapping.
    */
  @volatile var lastSettingsScope: Map[String, String] = Map.empty
  @volatile var lastDroppedSettings: Seq[(String, String)] = Nil

  /** A session scoped to the statement's mapped settings: a CLONE of the
    * caller's session (temp views, registered functions, extensions and
    * confs all copied; the SparkContext is shared) with the statement's
    * confs set on the clone only. CH settings are per-statement by
    * definition — the clone makes the scope exact without mutating the
    * shared session conf (concurrent statements each see their own
    * settings) and without forcing eager execution: the returned frame
    * executes under the clone's conf whenever the caller materializes
    * it, and the throwaway clone is unreachable (and collectable) once
    * the frame is. Cost note: each clone registers an execution-listener
    * bus on the shared context, held by WEAK reference (SPARK-34087) —
    * it self-unregisters once the clone is collected, so a stream of
    * SETTINGS statements is bounded by GC, not by statement count;
    * callers that CACHE the returned frames pin their clones like any
    * held session.
    */
  private def settingsScopedSession(spark: SparkSession,
      settings: Seq[(String, String)]): SparkSession = {
    val confs = settings.flatMap { case (k, v) => SettingConfs.get(k).map(_ -> v) }
    lastDroppedSettings = settings.filterNot(s => SettingConfs.contains(s._1))
    val scoped = org.apache.spark.sql.graft.Bridge.cloneSession(spark)
    confs.foreach { case (ck, v) => scoped.conf.set(ck, v) }
    lastSettingsScope = confs.map { case (ck, _) => ck -> scoped.conf.get(ck) }.toMap
    scoped
  }

  def sql(spark: SparkSession, text: String): DataFrame =
    extractFill(text) match {
      case None =>
        val r = rewriteWithFormat(text)
        if (!r.settings.exists(s => SettingConfs.contains(s._1)))
          spark.sql(r.sql)
        else settingsScopedSession(spark, r.settings).sql(r.sql)
      case Some(f) =>
        import org.apache.spark.sql.functions.{col, expr, lit}
        import org.apache.spark.sql.types._
        val inner = sql(spark, f.inner) // recursive: other clauses apply
        val axisType = inner.schema(f.axis).dataType
        // non-interpolated gap columns take CH type defaults
        val fillMap = inner.schema.fields
          .filterNot(fd => fd.name == f.axis || f.interpolate.contains(fd.name))
          .map { fd =>
            fd.dataType match {
              case _: NumericType => fd.name -> lit(0).cast(fd.dataType)
              case StringType => fd.name -> lit("")
              case BooleanType => fd.name -> lit(false)
              case dt => fd.name -> lit(null).cast(dt)
            }
          }.toMap
        val step = f.step.map(s => expr(s)).getOrElse(lit(1))
        val cast: String => Column = s => expr(s).cast(axisType)
        val filled = SelectDialect.withFillInterpolate(inner, f.axis, step,
          fillMap, f.interpolate, Seq.empty,
          from = f.from.map(cast), to = f.to.map(cast))
        f.limit.fold(filled)(filled.limit)
    }
}
