package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse encoding/IP scalar dialect: `hex`/`unhex`,
  * `base64Encode`/`base64Decode`/`tryBase64Decode`,
  * `bitShiftLeft`/`bitShiftRight`, `IPv4NumToString`/`IPv4StringToNum`/
  * `isIPv4String` — the everyday CH idioms the reference's Vector-SQL
  * dialect teaches (reference docs/vector-sql.md describes the SQL the
  * LLM emits as ClickHouse SQL). Semantics follow the public CH docs:
  *
  *  - hex(String) = uppercase hex of the UTF-8 bytes; hex(intN) =
  *    big-endian bytes, leading zero BYTES skipped, both digits of every
  *    kept byte printed (hex(1)='01', hex(0)='00' — note DuckDB's
  *    hex(int) prints '1'/'0'; oracles lpad to even length).
  *  - unhex: case-insensitive; an odd digit count implies a leading 0
  *    nibble; invalid digits fail loudly (CH leaves them unspecified).
  *  - base64Decode throws on invalid input; tryBase64Decode returns ''.
  *  - bitShiftLeft/Right(a, b): shift amounts outside [0, 64) return 0
  *    (CH's "shift past the width" rule), inside it Java's wrapping
  *    shift matches CH's two's-complement arithmetic.
  *  - IPv4*: dotted-quad <-> UInt32; IPv4StringToNum throws on a
  *    malformed address (CH behavior), isIPv4String is the guard.
  *
  * All per-row loops are static calls behind defineCodeGen, so the
  * family rides whole-stage codegen like StringSims/Readable.
  */
object EncodingOps {
  private val HexDigits = "0123456789ABCDEF".toCharArray

  def hexBytes(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexDigits(b >>> 4).toByte
      out(i * 2 + 1) = HexDigits(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def hexString(s: UTF8String): UTF8String = hexBytes(s.getBytes)

  /** CH hex(int): big-endian, skip leading zero bytes, keep full bytes. */
  def hexLong(x: Long): UTF8String = {
    var nBytes = 8
    // count leading zero BYTES (at least one byte always printed)
    var v = x
    if (x >= 0) {
      nBytes = 1
      var t = x >>> 8
      while (t != 0) { nBytes += 1; t >>>= 8 }
    }
    val out = new Array[Byte](nBytes * 2)
    var i = nBytes - 1
    var j = 0
    while (i >= 0) {
      val b = ((v >>> (i * 8)) & 0xff).toInt
      out(j) = HexDigits(b >>> 4).toByte
      out(j + 1) = HexDigits(b & 0xf).toByte
      i -= 1; j += 2
    }
    UTF8String.fromBytes(out)
  }

  private def nibble(c: Byte): Int = c match {
    case d if d >= '0' && d <= '9' => d - '0'
    case d if d >= 'a' && d <= 'f' => d - 'a' + 10
    case d if d >= 'A' && d <= 'F' => d - 'A' + 10
    case other => throw new IllegalArgumentException(
      s"unhex: invalid hex digit '${other.toChar}'")
  }

  def unhex(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val odd = (in.length & 1) == 1
    val out = new Array[Byte]((in.length + 1) / 2)
    var i = 0
    var j = 0
    if (odd) { out(0) = nibble(in(0)).toByte; i = 1; j = 1 }
    while (i < in.length) {
      out(j) = ((nibble(in(i)) << 4) | nibble(in(i + 1))).toByte
      i += 2; j += 1
    }
    UTF8String.fromBytes(out)
  }

  def base64Encode(s: UTF8String): UTF8String =
    UTF8String.fromBytes(java.util.Base64.getEncoder.encode(s.getBytes))

  def base64Decode(s: UTF8String): UTF8String =
    UTF8String.fromBytes(java.util.Base64.getDecoder.decode(s.getBytes))

  def tryBase64Decode(s: UTF8String): UTF8String =
    try base64Decode(s)
    catch { case _: IllegalArgumentException => UTF8String.EMPTY_UTF8 }

  def bitShiftLeft(a: Long, b: Long): Long =
    if (b < 0L || b >= 64L) 0L else a << b

  def bitShiftRight(a: Long, b: Long): Long =
    if (b < 0L || b >= 64L) 0L else a >> b

  def ipv4NumToString(n: Long): UTF8String = {
    val v = n & 0xffffffffL
    UTF8String.fromString(
      s"${(v >>> 24) & 255}.${(v >>> 16) & 255}.${(v >>> 8) & 255}.${v & 255}")
  }

  /** Strict dotted-quad parse: exactly 4 decimal octets 0..255, no signs,
    * no leading '+', empty parts invalid. Leading zeros ARE accepted
    * ('010' = 10) — CH's parser accepts them.
    */
  private def parseIpv4(s: UTF8String): Long = {
    val b = s.getBytes
    var i = 0
    var octets = 0
    var acc = 0L
    var part = -1L // -1 = no digit seen yet in current part
    var digits = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        part = (if (part < 0) 0L else part) * 10 + (c - '0')
        digits += 1
        if (part > 255L || digits > 3) return -1L
      } else if (c == '.') {
        if (part < 0 || octets >= 3) return -1L
        acc = (acc << 8) | part
        octets += 1; part = -1L; digits = 0
      } else return -1L
      i += 1
    }
    if (part < 0 || octets != 3) return -1L
    (acc << 8) | part
  }

  def ipv4StringToNum(s: UTF8String): Long = {
    val v = parseIpv4(s)
    if (v < 0) throw new IllegalArgumentException(
      s"IPv4StringToNum: invalid IPv4 address '${s.toString}'")
    v
  }

  def isIpv4String(s: UTF8String): Boolean = parseIpv4(s) >= 0
}

/** hex() is polymorphic (string bytes vs integer value); dispatch on the
  * resolved child type.
  */
case class ChHex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "hex"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | IntegerType | LongType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hex expects a string/binary/integer argument, got $t")
  }

  protected override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => EncodingOps.hexString(v.asInstanceOf[UTF8String])
    case BinaryType => EncodingOps.hexBytes(v.asInstanceOf[Array[Byte]])
    case _ => EncodingOps.hexLong(v.asInstanceOf[Number].longValue())
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev,
        c => s"org.apache.spark.sql.graft.EncodingOps.hexString($c)")
      case BinaryType => defineCodeGen(ctx, ev,
        c => s"org.apache.spark.sql.graft.EncodingOps.hexBytes($c)")
      case _ => defineCodeGen(ctx, ev,
        c => s"org.apache.spark.sql.graft.EncodingOps.hexLong((long) $c)")
    }

  override protected def withNewChildInternal(c: Expression): ChHex = copy(child = c)
}

abstract class StringToStringExpr extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  protected def staticCall: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.EncodingOps.$staticCall($c)")
}

case class ChUnhex(child: Expression) extends StringToStringExpr {
  override def prettyName: String = "unhex"
  override protected def staticCall: String = "unhex"
  protected override def nullSafeEval(v: Any): Any =
    EncodingOps.unhex(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): ChUnhex = copy(child = c)
}

case class Base64Encode(child: Expression) extends StringToStringExpr {
  override def prettyName: String = "base64_encode"
  override protected def staticCall: String = "base64Encode"
  protected override def nullSafeEval(v: Any): Any =
    EncodingOps.base64Encode(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Base64Encode = copy(child = c)
}

case class Base64Decode(child: Expression) extends StringToStringExpr {
  override def prettyName: String = "base64_decode"
  override protected def staticCall: String = "base64Decode"
  protected override def nullSafeEval(v: Any): Any =
    EncodingOps.base64Decode(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Base64Decode = copy(child = c)
}

case class TryBase64Decode(child: Expression) extends StringToStringExpr {
  override def prettyName: String = "try_base64_decode"
  override protected def staticCall: String = "tryBase64Decode"
  protected override def nullSafeEval(v: Any): Any =
    EncodingOps.tryBase64Decode(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): TryBase64Decode = copy(child = c)
}

abstract class LongShiftExpr extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  protected def staticCall: String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.EncodingOps.$staticCall($a, $b)")
}

case class BitShiftLeft(left: Expression, right: Expression) extends LongShiftExpr {
  override def prettyName: String = "bit_shift_left"
  override protected def staticCall: String = "bitShiftLeft"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    EncodingOps.bitShiftLeft(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class BitShiftRight(left: Expression, right: Expression) extends LongShiftExpr {
  override def prettyName: String = "bit_shift_right"
  override protected def staticCall: String = "bitShiftRight"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    EncodingOps.bitShiftRight(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class Ipv4NumToString(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ipv4_num_to_string"
  protected override def nullSafeEval(v: Any): Any =
    EncodingOps.ipv4NumToString(v.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.EncodingOps.ipv4NumToString($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class Ipv4StringToNum(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ipv4_string_to_num"
  protected override def nullSafeEval(v: Any): Any =
    EncodingOps.ipv4StringToNum(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.EncodingOps.ipv4StringToNum($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class IsIpv4String(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "is_ipv4_string"
  protected override def nullSafeEval(v: Any): Any =
    EncodingOps.isIpv4String(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.EncodingOps.isIpv4String($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Base58 (Bitcoin alphabet — the public algorithm CH implements),
  * Morton codes, bitmask decomposition, reinterpret — the encoding
  * dialect tail. All statics registered via StaticInvoke.
  */
object Encoding2Ops {
  private val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val B58Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    var i = 0
    while (i < B58.length) { r(B58.charAt(i)) = i; i += 1 }
    r
  }

  def base58Encode(s: UTF8String): UTF8String = {
    val in = s.getBytes
    if (in.isEmpty) return UTF8String.EMPTY_UTF8
    var zeros = 0
    while (zeros < in.length && in(zeros) == 0) zeros += 1
    // big-number division in base 256 -> base 58 (reference algorithm)
    val digits = new Array[Int](in.length * 2)
    var len = 0
    var i = zeros
    while (i < in.length) {
      var carry = in(i) & 0xff
      var j = 0
      while (j < len || carry != 0) {
        if (j < len) carry += digits(j) * 256
        digits(j) = carry % 58
        carry /= 58
        if (j >= len) len = j + 1
        j += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var z = 0
    while (z < zeros) { sb.append('1'); z += 1 }
    var k = len - 1
    while (k >= 0) { sb.append(B58.charAt(digits(k))); k -= 1 }
    UTF8String.fromString(sb.toString)
  }

  def base58Decode(s: UTF8String): UTF8String = {
    val in = s.toString
    if (in.isEmpty) return UTF8String.EMPTY_UTF8
    var zeros = 0
    while (zeros < in.length && in.charAt(zeros) == '1') zeros += 1
    val bytes = new Array[Int](in.length)
    var len = 0
    var i = zeros
    while (i < in.length) {
      val c = in.charAt(i)
      val d = if (c < 128) B58Rev(c) else -1
      if (d < 0) throw new IllegalArgumentException(
        s"base58Decode: invalid character '$c'")
      var carry = d
      var j = 0
      while (j < len || carry != 0) {
        if (j < len) carry += bytes(j) * 58
        bytes(j) = carry & 0xff
        carry >>= 8
        if (j >= len) len = j + 1
        j += 1
      }
      i += 1
    }
    val out = new Array[Byte](zeros + len)
    var k = 0
    while (k < len) { out(zeros + k) = bytes(len - 1 - k).toByte; k += 1 }
    UTF8String.fromBytes(out)
  }

  /** Morton (Z-order) interleave of two unsigned-32-bit coordinates. */
  def mortonEncode(x: Long, y: Long): Long = {
    require(x >= 0 && x <= 0xffffffffL && y >= 0 && y <= 0xffffffffL,
      s"mortonEncode coordinates must be in [0, 2^32), got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }

  private def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  private def unspread(v0: Long): Long = {
    var v = v0 & 0x5555555555555555L
    v = (v | (v >> 1)) & 0x3333333333333333L
    v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >> 8)) & 0x0000ffff0000ffffL
    v = (v | (v >> 16)) & 0x00000000ffffffffL
    v
  }

  def mortonDecodeX(z: Long): Long = unspread(z)
  def mortonDecodeY(z: Long): Long = unspread(z >>> 1)

  /** CH bitmaskToArray: the set powers of two, ascending. */
  def bitmaskToArray(x0: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    var x = x0
    val out = new scala.collection.mutable.ArrayBuffer[Any](java.lang.Long.bitCount(x))
    while (x != 0L) {
      val low = x & -x
      out += low
      x ^= low
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def bitmaskToList(x: Long): UTF8String = {
    val arr = bitmaskToArray(x)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < arr.numElements()) {
      if (i > 0) sb.append(',')
      sb.append(arr.getLong(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** CH unbin: '0'/'1' digits to string bytes; a length that is not a
    * multiple of 8 implies leading 0 bits (the unhex rule in base 2).
    */
  def unbin(s: UTF8String): UTF8String = {
    val in = s.getBytes
    if (in.isEmpty) return UTF8String.EMPTY_UTF8
    val nBytes = (in.length + 7) / 8
    val out = new Array[Byte](nBytes)
    var i = in.length - 1
    var bit = 0
    while (i >= 0) {
      val c = in(i)
      if (c == '1') out(nBytes - 1 - bit / 8) =
        (out(nBytes - 1 - bit / 8) | (1 << (bit % 8))).toByte
      else if (c != '0') throw new IllegalArgumentException(
        s"unbin: invalid binary digit '${c.toChar}'")
      bit += 1
      i -= 1
    }
    UTF8String.fromBytes(out)
  }

  /** CH reinterpretAsUInt32: first 4 bytes of the string LITTLE-endian
    * (missing bytes read as 0).
    */
  def reinterpretAsUInt32(s: UTF8String): Long = {
    val b = s.getBytes
    var r = 0L
    var i = 0
    while (i < 4 && i < b.length) { r |= (b(i) & 0xffL) << (8 * i); i += 1 }
    r
  }
}
