package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Gates for the encoding/bit/IP scalar dialect (Encoding.scala) —
  * ClickHouse conventions pinned point-by-point:
  *   - hex(int) pads to whole BYTES and skips leading zero bytes
  *     (hex(1)='01', hex(0)='00', hex(-1)=16 F's);
  *   - unhex is case-insensitive, odd digit counts imply a leading 0
  *     nibble, invalid digits fail loudly;
  *   - base64Decode throws where tryBase64Decode returns '';
  *   - shifts outside [0, 64) return 0 (CH's past-the-width rule);
  *   - IPv4 functions round-trip, reject >255 octets / short quads /
  *     junk, and accept leading zeros (the CH parser does).
  */
class EncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def one(sql: String): Row =
    spark.sql(s"SELECT $sql").collect()(0)

  test("hex of strings and binary is uppercase byte hex") {
    val r = one("hex('abc') AS a, hex('Hello') AS b, hex('') AS c")
    assert(r.getString(0) == "616263")
    assert(r.getString(1) == "48656C6C6F")
    assert(r.getString(2) == "")
  }

  test("hex of integers: whole bytes, leading zero bytes skipped") {
    val r = one("hex(1L) AS a, hex(0L) AS b, hex(255L) AS c, " +
      "hex(256L) AS d, hex(4294967295L) AS e, hex(-1L) AS f")
    assert(r.getString(0) == "01")
    assert(r.getString(1) == "00")
    assert(r.getString(2) == "FF")
    assert(r.getString(3) == "0100")
    assert(r.getString(4) == "FFFFFFFF")
    assert(r.getString(5) == "FFFFFFFFFFFFFFFF")
  }

  test("unhex: round-trip, case-insensitive, odd length leading nibble") {
    val r = one("unhex(hex('graft')) AS a, unhex('414243') AS b, " +
      "unhex('4a4B') AS c, unhex('F') AS d")
    assert(r.getString(0) == "graft")
    assert(r.getString(1) == "ABC")
    assert(r.getString(2) == "JK")
    assert(r.getString(3) == "\u000f") // odd -> leading 0 nibble: 0x0F
  }

  test("unhex rejects non-hex digits loudly") {
    val e = intercept[Exception] { one("unhex('4G')") }
    assert(e.getMessage != null)
  }

  test("base64 family: round-trip, strict decode, try-decode") {
    val r = one("base64Encode('Hello') AS a, " +
      "base64Decode('SGVsbG8=') AS b, " +
      "tryBase64Decode('SGVsbG8=') AS c, " +
      "tryBase64Decode('not base64!') AS d, " +
      "base64Encode('') AS e")
    assert(r.getString(0) == "SGVsbG8=")
    assert(r.getString(1) == "Hello")
    assert(r.getString(2) == "Hello")
    assert(r.getString(3) == "")
    assert(r.getString(4) == "")
    intercept[Exception] { one("base64Decode('not base64!')") }
  }

  test("bit shifts: in-range wraps like two's complement, past-width is 0") {
    val r = one("bitShiftLeft(5L, 3L) AS a, bitShiftRight(1024L, 4L) AS b, " +
      "bitShiftRight(-8L, 1L) AS c, bitShiftLeft(1L, 64L) AS d, " +
      "bitShiftRight(1L, 64L) AS e, bitShiftLeft(1L, -1L) AS f, " +
      "bitShiftLeft(1L, 63L) AS g")
    assert(r.getLong(0) == 40L)
    assert(r.getLong(1) == 64L)
    assert(r.getLong(2) == -4L) // arithmetic shift
    assert(r.getLong(3) == 0L)
    assert(r.getLong(4) == 0L)
    assert(r.getLong(5) == 0L)
    assert(r.getLong(6) == Long.MinValue) // wraps, matching CH Int64
  }

  test("IPv4 functions: round-trip and validation boundaries") {
    val r = one("IPv4NumToString(3232235777L) AS a, " +
      "IPv4StringToNum('192.168.1.1') AS b, " +
      "IPv4NumToString(0L) AS c, IPv4NumToString(4294967295L) AS d, " +
      "isIPv4String('192.168.1.1') AS e, isIPv4String('256.0.0.1') AS f, " +
      "isIPv4String('1.2.3') AS g, isIPv4String('1.2.3.4.5') AS h, " +
      "isIPv4String('a.b.c.d') AS i, isIPv4String('') AS j, " +
      "isIPv4String('010.001.000.255') AS k, isIPv4String('1..2.3') AS l")
    assert(r.getString(0) == "192.168.1.1")
    assert(r.getLong(1) == 3232235777L)
    assert(r.getString(2) == "0.0.0.0")
    assert(r.getString(3) == "255.255.255.255")
    assert(r.getBoolean(4))
    assert(!r.getBoolean(5))
    assert(!r.getBoolean(6))
    assert(!r.getBoolean(7))
    assert(!r.getBoolean(8))
    assert(!r.getBoolean(9))
    assert(r.getBoolean(10)) // leading zeros accepted
    assert(!r.getBoolean(11)) // empty octet rejected
    intercept[Exception] { one("IPv4StringToNum('999.0.0.1')") }
  }

  test("leading-zero octets parse by value") {
    val r = one("IPv4StringToNum('010.001.000.255') AS a")
    assert(r.getLong(0) == ((10L << 24) | (1L << 16) | 255L))
  }
}
