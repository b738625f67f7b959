package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the round-11 ClickHouse dialect closure (FnGap
  * audit): small per-row loops that compose poorly from builtins but are
  * one screen of exact code each. All behind `defineCodeGen` static
  * calls so they ride whole-stage codegen (the StringSims pattern).
  */
object MiscOps {

  /** CH countDigits: decimal digits of the integer part; 0 -> 1. */
  def countDigits(x: Long): Int = {
    var v = math.abs(x)
    var d = 1
    while (v >= 10) { v /= 10; d += 1 }
    d
  }

  /** CH appendTrailingCharIfAbsent(s, c): append c unless s ends with it
    * (c must be one character; '' passes through unchanged).
    */
  def appendTrailingCharIfAbsent(s: UTF8String, c: UTF8String): UTF8String = {
    val str = s.toString; val ch = c.toString
    require(ch.length == 1,
      s"appendTrailingCharIfAbsent: trailing char must be 1 char, got '$ch'")
    if (str.isEmpty || str.endsWith(ch)) s
    else UTF8String.fromString(str + ch)
  }

  /** CH truncate(x, n): toward-zero truncation at n decimal places —
    * pure IEEE ops (scale, chop, unscale), matching DuckDB's trunc when
    * written the same way.
    */
  def truncate(x: Double, n: Int): Double = {
    val scale = math.pow(10.0, n)
    val scaled = x * scale
    (if (scaled < 0) math.ceil(scaled) else math.floor(scaled)) / scale
  }

  /** CH intExp10: exact 10^x as Int64 (x in [0, 18]; doubles lose
    * exactness past 2^53 so this is an integer loop, not pow).
    */
  def intExp10(x: Int): Long = {
    require(x >= 0 && x <= 18, s"intExp10: exponent must be in [0, 18], got $x")
    var r = 1L
    var i = 0
    while (i < x) { r *= 10L; i += 1 }
    r
  }

  /** CH roundAge: fixed CH age-bucket ladder (docs "roundAge"). */
  def roundAge(x: Long): Long =
    if (x < 1) 0L
    else if (x <= 17) 17L
    else if (x <= 24) 18L
    else if (x <= 34) 25L
    else if (x <= 44) 35L
    else if (x <= 54) 45L
    else 55L

  /** CH roundDuration: fixed CH session-length ladder (docs
    * "roundDuration": 0, 1, 10, 30, 60, 120, 180, 240, 300, 600, 1200,
    * 1800, 3600, 7200, 18000, 36000).
    */
  private val DurationLadder = Array(1L, 10L, 30L, 60L, 120L, 180L, 240L,
    300L, 600L, 1200L, 1800L, 3600L, 7200L, 18000L, 36000L)
  def roundDuration(x: Long): Long = {
    if (x < 1) return 0L
    var best = 1L
    var i = 0
    while (i < DurationLadder.length && DurationLadder(i) <= x) {
      best = DurationLadder(i); i += 1
    }
    best
  }

  /** CH roundToExp2: largest power of two <= x (x < 1 -> 0). */
  def roundToExp2(x: Long): Long =
    if (x < 1) 0L else java.lang.Long.highestOneBit(x)

  /** CH roundDown(x, arr): largest array element <= x, else the first
    * (smallest) element. Array evaluated per row; callers pass literals.
    */
  def roundDown(x: Double, arr: ArrayData): Double = {
    val n = arr.numElements()
    require(n > 0, "roundDown: boundary array must be non-empty")
    var best = Double.NaN
    var found = false
    var lo = arr.getDouble(0)
    var i = 0
    while (i < n) {
      val v = arr.getDouble(i)
      if (v < lo) lo = v
      if (v <= x && (!found || v > best)) { best = v; found = true }
      i += 1
    }
    if (found) best else lo
  }

  /** CH hasSubstr(a, b): b occurs in a as a CONTIGUOUS subsequence. */
  def hasSubstr(a: ArrayData, b: ArrayData, dt: DataType): Boolean = {
    val n = a.numElements(); val m = b.numElements()
    if (m == 0) return true
    if (m > n) return false
    val av = a.toObjectArray(dt); val bv = b.toObjectArray(dt)
    var i = 0
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val x = av(i + j); val y = bv(j)
        ok = (x == null && y == null) || (x != null && x == y)
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** CH arrayEnumerateUniq: 1-based occurrence index of each element
    * among its equals, in order ([10,20,10,30,10] -> [1,1,2,1,3]).
    */
  def arrayEnumerateUniq(a: ArrayData, dt: DataType): ArrayData = {
    val n = a.numElements()
    val out = new Array[Int](n)
    val seen = new java.util.HashMap[Any, Integer]()
    var nullSeen = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) { nullSeen += 1; out(i) = nullSeen }
      else {
        val v = a.get(i, dt)
        val prev = seen.get(v)
        val k = if (prev == null) 1 else prev + 1
        seen.put(v, k)
        out(i) = k
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** CH multiSearchFirstPosition: smallest 1-based position where ANY
    * needle occurs (0 when none). Byte positions, like CH's default.
    */
  def multiSearchFirstPosition(s: UTF8String, needles: ArrayData): Int = {
    val str = s.toString
    val n = needles.numElements()
    var best = -1
    var i = 0
    while (i < n) {
      if (!needles.isNullAt(i)) {
        val p = str.indexOf(needles.getUTF8String(i).toString)
        if (p >= 0 && (best < 0 || p < best)) best = p
      }
      i += 1
    }
    if (best < 0) 0 else best + 1
  }

  /** CH multiSearchFirstIndex: 1-based index of the FIRST NEEDLE (in
    * needle order) that occurs (0 when none).
    */
  def multiSearchFirstIndex(s: UTF8String, needles: ArrayData): Int = {
    val str = s.toString
    val n = needles.numElements()
    var i = 0
    while (i < n) {
      if (!needles.isNullAt(i) &&
          str.contains(needles.getUTF8String(i).toString)) return i + 1
      i += 1
    }
    0
  }

  /** CH replaceRegexpOne: first match only; CH uses \1 backreferences
    * where Java wants $1 — translated, with $ itself escaped first.
    */
  def replaceRegexpOne(s: UTF8String, re: UTF8String, to: UTF8String): UTF8String = {
    val repl = to.toString.replace("$", "\\$")
      .replaceAll("""\\(\d)""", """\$$1""")
    UTF8String.fromString(
      java.util.regex.Pattern.compile(re.toString).matcher(s.toString)
        .replaceFirst(repl))
  }

  /** CH javaHash(string): Java's String.hashCode, byte-exact. */
  def javaHash(s: UTF8String): Int = s.toString.hashCode

  /** CH halfMD5: first 8 bytes of MD5, interpreted BIG-endian (CH docs). */
  def halfMD5(s: UTF8String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    var r = 0L
    var i = 0
    while (i < 8) { r = (r << 8) | (d(i) & 0xffL); i += 1 }
    r
  }

  def sha224(s: UTF8String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-224").digest(s.getBytes)

  def sha256(s: UTF8String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes)

  /** erf / tgamma composed from SpecialMath's erfc / lnGamma (tgamma via
    * reflection for x < 0, poles at non-positive integers -> NaN).
    */
  def erf(x: Double): Double = 1.0 - SpecialMath.erfc(x)
  def tgamma(x: Double): Double =
    if (x > 0) math.exp(SpecialMath.lnGamma(x))
    else if (x == math.rint(x)) Double.NaN
    else math.Pi / (math.sin(math.Pi * x) * math.exp(SpecialMath.lnGamma(1.0 - x)))

  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0L
    val g = gcd(a, b)
    math.multiplyExact(math.abs(a) / g, math.abs(b)) // overflow fails loudly
  }

  /** CH JSONType name of the root value ('Object','Array','String',
    * 'Int64','Double','Bool','Null'); '' for invalid JSON (CH returns
    * an empty string on parse failure).
    */
  def jsonType(s: UTF8String): UTF8String = {
    val node =
      try {
        val p = jsonMapper.createParser(s.toString)
        val n = jsonMapper.readTree[com.fasterxml.jackson.databind.JsonNode](p)
        if (p.nextToken() != null) null else n
      } catch { case _: java.io.IOException => null }
    UTF8String.fromString(
      if (node == null) ""
      else if (node.isObject) "Object"
      else if (node.isArray) "Array"
      else if (node.isTextual) "String"
      else if (node.isIntegralNumber) "Int64"
      else if (node.isNumber) "Double"
      else if (node.isBoolean) "Bool"
      else "Null")
  }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()
  /** CH isValidJSON: strict whole-string parse (Jackson, on the Spark
    * classpath). Scalars ('3', '"x"') are valid JSON documents, as in CH.
    */
  def isValidJson(s: UTF8String): Boolean =
    try {
      val p = jsonMapper.createParser(s.toString)
      jsonMapper.readTree(p)
      p.nextToken() == null // trailing garbage -> invalid
    } catch { case _: java.io.IOException => false }
}

/** `toTypeName(x)`: the SQL type name of the argument — resolved from
  * the child's dataType, constant per query (foldable).
  */
case class ToTypeName(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  // foldable: the optimizer constant-folds this before execution, so the
  // CodegenFallback path never runs in a hot loop
  override def foldable: Boolean = true
  override def prettyName: String = "to_type_name"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    UTF8String.fromString(child.dataType.sql)
  override protected def withNewChildInternal(c: Expression): ToTypeName =
    copy(child = c)
}

/** hasSubstr needs the element type for value extraction — a thin
  * expression rather than a StaticInvoke.
  */
case class HasSubstr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "has_substr"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // NullType element = the empty-array literal; always acceptable
      case (ArrayType(a, _), ArrayType(b, _))
        if a.sameType(b) || a == NullType || b == NullType =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hasSubstr expects two arrays of one element type, got ($a, $b)")
    }

  private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    MiscOps.hasSubstr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elemType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dt = ctx.addReferenceObj("elemType", elemType, classOf[DataType].getName)
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.MiscOps.hasSubstr($a, $b, $dt)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** arrayEnumerateUniq — 1-based occurrence index per element. */
case class ArrayEnumerateUniq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_enumerate_uniq"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"arrayEnumerateUniq expects an array, got $t")
  }

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  protected override def nullSafeEval(v: Any): Any =
    MiscOps.arrayEnumerateUniq(v.asInstanceOf[ArrayData], elemType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dt = ctx.addReferenceObj("elemType", elemType, classOf[DataType].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MiscOps.arrayEnumerateUniq($c, $dt)")
  }

  override protected def withNewChildInternal(c: Expression): ArrayEnumerateUniq =
    copy(child = c)
}

/** CH `format('{} and {}', args...)` / `format('{1}-{0}', ...)`:
  * positional and indexed placeholders. Constant pattern not required —
  * evaluated per row (the loop is the cost either way).
  */
case class FormatCH(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty, "format(pattern, args...)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "format"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.head.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("format pattern must be a string")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val pat = children.head.eval(input)
    if (pat == null) return null
    val args = children.tail.map { c =>
      val v = c.eval(input)
      if (v == null) return null
      v.toString
    }
    val p = pat.toString
    val sb = new java.lang.StringBuilder
    var i = 0
    var next = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '{') {
        val close = p.indexOf('}', i)
        require(close > i, s"format: unbalanced '{' in pattern '$p'")
        val body = p.substring(i + 1, close)
        val idx = if (body.isEmpty) { val k = next; next += 1; k } else body.toInt
        require(idx >= 0 && idx < args.length,
          s"format: placeholder {$body} out of range (have ${args.length} args)")
        sb.append(args(idx))
        i = close + 1
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw new UnsupportedOperationException("FormatCH is CodegenFallback")
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FormatCH = copy(children = c)
}

/** CH extractAllGroupsVertical(s, re): one inner array PER MATCH, each
  * holding that match's capture groups — static over Java regex.
  */
object RegexVerticalOps {
  def extractAllGroupsVertical(s: UTF8String, re: UTF8String): GenericArrayData = {
    val p = java.util.regex.Pattern.compile(re.toString)
    val m = p.matcher(s.toString)
    val groups = m.groupCount()
    require(groups >= 1, "extractAllGroupsVertical: pattern needs capture groups")
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    while (m.find()) {
      val row = new Array[Any](groups)
      var g = 0
      while (g < groups) {
        val v = m.group(g + 1)
        row(g) = if (v == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(v)
        g += 1
      }
      out += new GenericArrayData(row)
    }
    new GenericArrayData(out.toArray)
  }
}

/** graft arrayFill(mask, arr): where mask(i) is FALSE, position i takes
  * the previous kept value (first positions before any TRUE keep their
  * own value — CH's rule). CH spells this with a lambda
  * (`arrayFill(x -> cond, arr)`); graft takes the precomputed BOOLEAN
  * mask (build it with arrayMap), keeping the kernel lambda-free.
  */
case class ArrayFillMask(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "array_fill"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(BooleanType, _), ArrayType(_, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"arrayFill expects (array<boolean> mask, array values), got ($a, $b)")
    }

  override def dataType: DataType = right.dataType

  private lazy val elemType = right.dataType.asInstanceOf[ArrayType].elementType

  protected override def nullSafeEval(m: Any, v: Any): Any = {
    val mask = m.asInstanceOf[ArrayData]
    val vals = v.asInstanceOf[ArrayData]
    val n = math.min(mask.numElements(), vals.numElements())
    val out = new Array[Any](vals.numElements())
    var i = 0
    var carry: Any = null
    var haveCarry = false
    while (i < out.length) {
      val keep = i >= n || (!mask.isNullAt(i) && mask.getBoolean(i))
      val cur = if (vals.isNullAt(i)) null else vals.get(i, elemType)
      if (keep || !haveCarry) { carry = cur; haveCarry = true; out(i) = cur }
      else out(i) = carry
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("arrayFill", this, classOf[ArrayFillMask].getName)
    nullSafeCodeGen(ctx, ev, (m, v) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.kernel($m, $v);")
  }

  /** Codegen entry point (nullSafeEval is protected). */
  def kernel(m: Any, v: Any): Any = nullSafeEval(m, v)

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
