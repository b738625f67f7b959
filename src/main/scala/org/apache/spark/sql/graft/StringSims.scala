package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy string matching for the dedup/curation pipeline, ClickHouse
  * names: `damerauLevenshteinDistance` (TRUE Damerau–Levenshtein, not
  * the restricted OSA — 'CA'→'ABC' is 2), `jaroSimilarity`,
  * `jaroWinklerSimilarity` (p = 0.1, prefix ≤ 4, boost only above the
  * 0.7 threshold — the ClickHouse/DuckDB convention; either side empty
  * → 0), `stringJaccardIndex` (character-SET Jaccard), and
  * `ngramDistance` (Sørensen–Dice distance over 4-gram multisets;
  * strings shorter than 4 chars contribute themselves as one gram).
  * `editDistance`/`levenshteinDistance` register onto Spark's native
  * Levenshtein. All per-row scalar loops behind `defineCodeGen` static
  * calls, so the family rides whole-stage codegen.
  */
object StringSimOps {

  def damerauLevenshtein(a0: UTF8String, b0: UTF8String): Int = {
    val a = a0.toString
    val b = b0.toString
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // true DL with the "last occurrence" alphabet map (public algorithm)
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = Option(da.get(b.charAt(j - 1))).map(_.intValue()).getOrElse(0)
        val j1 = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  def jaro(a0: UTF8String, b0: UTF8String): Double = {
    val a = a0.toString; val b = b0.toString
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val aM = new Array[Boolean](n)
    val bM = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // transpositions = floor(mismatched-position count / 2) — the
    // Commons/DuckDB convention (the fractional t/2 variant differs by
    // half a transposition when the mismatch count is odd)
    (mm / n + mm / m + (mm - (t / 2)) / mm) / 3.0
  }

  def jaroWinkler(a0: UTF8String, b0: UTF8String): Double = {
    val sim = jaro(a0, b0)
    if (sim <= 0.7) return sim
    val a = a0.toString; val b = b0.toString
    var l = 0
    val maxL = math.min(4, math.min(a.length, b.length))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    sim + l * 0.1 * (1.0 - sim)
  }

  def jaccardChars(a0: UTF8String, b0: UTF8String): Double = {
    val a = a0.toString; val b = b0.toString
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = new java.util.HashSet[Character]()
    val sb = new java.util.HashSet[Character]()
    a.foreach(sa.add(_))
    b.foreach(sb.add(_))
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size() + sb.size() - inter)
  }

  private def grams4(s: String): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    if (s.isEmpty) return m
    if (s.length < 4) { m.put(s, 1); return m }
    var i = 0
    while (i + 4 <= s.length) {
      val g = s.substring(i, i + 4)
      val prev = m.get(g)
      m.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    m
  }

  def ngramDistance(a0: UTF8String, b0: UTF8String): Double = {
    val ga = grams4(a0.toString)
    val gb = grams4(b0.toString)
    var na = 0; var nb = 0; var common = 0
    val ia = ga.entrySet().iterator()
    while (ia.hasNext) { na += ia.next().getValue.intValue() }
    val ib = gb.entrySet().iterator()
    while (ib.hasNext) { nb += ib.next().getValue.intValue() }
    if (na + nb == 0) return 0.0
    val it = ga.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = gb.get(e.getKey)
      if (other != null) common += math.min(e.getValue.intValue(), other.intValue())
    }
    1.0 - 2.0 * common / (na + nb)
  }
}

abstract class StringSimExpr extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def nullIntolerant: Boolean = true
  protected def staticCall: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.StringSimOps.$staticCall($a, $b)")
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein_distance"
  override protected def staticCall: String = "damerauLevenshtein"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    StringSimOps.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"
  override protected def staticCall: String = "jaro"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    StringSimOps.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override protected def staticCall: String = "jaroWinkler"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    StringSimOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class StringJaccardIndex(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "string_jaccard_index"
  override protected def staticCall: String = "jaccardChars"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    StringSimOps.jaccardChars(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class NgramDistance(left: Expression, right: Expression)
    extends StringSimExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_distance"
  override protected def staticCall: String = "ngramDistance"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    StringSimOps.ngramDistance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
