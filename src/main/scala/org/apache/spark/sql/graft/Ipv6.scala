package org.apache.spark.sql.graft

import org.apache.spark.unsafe.types.UTF8String

/** IPv6 + CIDR tail of the CH IP dialect (Encoding.scala holds the IPv4
  * core): hand-rolled RFC 4291 parser and RFC 5952 canonical formatter —
  * no java.net.InetAddress (its getByName can trigger resolver paths;
  * a literal parser is deterministic and offline by construction).
  *
  * Formats handled: full/compressed hex groups ('::' once), embedded
  * dotted-quad tail ('::ffff:1.2.3.4'), case-insensitive. Canonical
  * output: lowercase, longest zero run (>= 2 groups) compressed,
  * leftmost on ties — RFC 5952, which is also CH's output.
  */
object Ipv6Ops {

  /** 16 bytes, or null when s is not a valid IPv6 literal. */
  def parse(s: String): Array[Byte] = {
    if (s == null || s.isEmpty) return null
    var str = s
    // split an embedded IPv4 tail first
    var v4: Array[Int] = null
    val lastColon = str.lastIndexOf(':')
    if (lastColon >= 0 && str.indexOf('.', lastColon) > lastColon) {
      val tail = str.substring(lastColon + 1)
      val parts = tail.split("\\.", -1)
      if (parts.length != 4) return null
      v4 = new Array[Int](4)
      var i = 0
      while (i < 4) {
        val p = parts(i)
        if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
        v4(i) = p.toInt
        if (v4(i) > 255) return null
        i += 1
      }
      str = str.substring(0, lastColon + 1) // keep trailing ':'
      if (str == ":") return null // ":1.2.3.4" is not valid
      str = str + (if (v4 == null) "" else "0:0") // placeholder two groups
    }
    val dcl = str.indexOf("::")
    if (dcl != str.lastIndexOf("::")) return null // at most one '::'
    def groups(part: String): Array[Int] = {
      if (part.isEmpty) return Array.emptyIntArray
      val gs = part.split(":", -1)
      val out = new Array[Int](gs.length)
      var i = 0
      while (i < gs.length) {
        val g = gs(i)
        if (g.isEmpty || g.length > 4) return null
        var v = 0
        var j = 0
        while (j < g.length) {
          val c = g.charAt(j)
          val d =
            if (c >= '0' && c <= '9') c - '0'
            else if (c >= 'a' && c <= 'f') c - 'a' + 10
            else if (c >= 'A' && c <= 'F') c - 'A' + 10
            else return null
          v = v * 16 + d
          j += 1
        }
        out(i) = v
        i += 1
      }
      out
    }
    val all: Array[Int] =
      if (dcl < 0) {
        val g = groups(str)
        if (g == null || g.length != 8) return null
        g
      } else {
        val left = groups(str.substring(0, dcl))
        val right = groups(str.substring(dcl + 2))
        if (left == null || right == null) return null
        val missing = 8 - left.length - right.length
        if (missing < 1) return null
        left ++ Array.fill(missing)(0) ++ right
      }
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      bytes(i * 2) = (all(i) >> 8).toByte
      bytes(i * 2 + 1) = (all(i) & 0xff).toByte
      i += 1
    }
    if (v4 != null) {
      // overwrite the placeholder last two groups with the dotted quad
      bytes(12) = v4(0).toByte; bytes(13) = v4(1).toByte
      bytes(14) = v4(2).toByte; bytes(15) = v4(3).toByte
    }
    bytes
  }

  /** RFC 5952 canonical text of 16 bytes. */
  def format(b: Array[Byte]): String = {
    require(b.length == 16, s"IPv6 value must be 16 bytes, got ${b.length}")
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) { g(i) = ((b(i * 2) & 0xff) << 8) | (b(i * 2 + 1) & 0xff); i += 1 }
    // longest zero run of length >= 2, leftmost on ties
    var bestStart = -1; var bestLen = 0
    var s = -1
    i = 0
    while (i <= 8) {
      if (i < 8 && g(i) == 0) { if (s < 0) s = i }
      else {
        if (s >= 0) {
          val len = i - s
          if (len >= 2 && len > bestLen) { bestStart = s; bestLen = len }
          s = -1
        }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::") // the run marker IS both separators
        i += bestLen
        if (i == 8) return sb.toString
      } else {
        if (i > 0 && sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
    }
    sb.toString
  }

  // --- UTF8String-facing statics (registered via StaticInvoke) ---------

  def isIpv6String(s: UTF8String): Boolean = parse(s.toString) != null

  def ipv6StringToNum(s: UTF8String): Array[Byte] = {
    val b = parse(s.toString)
    if (b == null) throw new IllegalArgumentException(
      s"IPv6StringToNum: invalid IPv6 address '${s.toString}'")
    b
  }

  def ipv6NumToString(b: Array[Byte]): UTF8String =
    UTF8String.fromString(format(b))

  /** CH IPv4ToIPv6: the ::ffff:a.b.c.d mapped form as 16 bytes. */
  def ipv4ToIpv6(n: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    b(10) = 0xff.toByte; b(11) = 0xff.toByte
    val v = n & 0xffffffffL
    b(12) = (v >>> 24).toByte; b(13) = ((v >>> 16) & 0xff).toByte
    b(14) = ((v >>> 8) & 0xff).toByte; b(15) = (v & 0xff).toByte
    b
  }

  /** CH IPv4CIDRToRange: inclusive [lo, hi] of a v4 CIDR as a struct of
    * dotted quads — here returned as "lo|hi" (struct assembly happens in
    * the registry builder via two calls; this packs once).
    */
  def ipv4CidrLo(n: Long, prefix: Int): Long = {
    require(prefix >= 0 && prefix <= 32, s"IPv4 CIDR prefix must be 0..32, got $prefix")
    val mask = if (prefix == 0) 0L else (0xffffffffL << (32 - prefix)) & 0xffffffffL
    (n & 0xffffffffL) & mask
  }

  def ipv4CidrHi(n: Long, prefix: Int): Long = {
    require(prefix >= 0 && prefix <= 32, s"IPv4 CIDR prefix must be 0..32, got $prefix")
    val mask = if (prefix == 0) 0L else (0xffffffffL << (32 - prefix)) & 0xffffffffL
    ((n & 0xffffffffL) & mask) | (~mask & 0xffffffffL)
  }

  /** CH isIPAddressInRange(addr, 'cidr') — v4 and v6 literals. */
  def isIpAddressInRange(addr: UTF8String, cidr: UTF8String): Boolean = {
    val c = cidr.toString
    val slash = c.indexOf('/')
    if (slash < 0) return false
    val base = c.substring(0, slash)
    val prefix = try c.substring(slash + 1).toInt catch { case _: Exception => return false }
    val a = addr.toString
    if (base.contains(':')) {
      val ab = parse(a); val bb = parse(base)
      if (ab == null || bb == null || prefix < 0 || prefix > 128) return false
      bitsEqual(ab, bb, prefix)
    } else {
      if (prefix < 0 || prefix > 32) return false
      val an = EncodingOps.isIpv4String(addr)
      if (!an) return false
      val av = EncodingOps.ipv4StringToNum(addr)
      val bv = try EncodingOps.ipv4StringToNum(UTF8String.fromString(base))
        catch { case _: IllegalArgumentException => return false }
      ipv4CidrLo(bv, prefix) == ipv4CidrLo(av, prefix)
    }
  }

  private def bitsEqual(a: Array[Byte], b: Array[Byte], prefix: Int): Boolean = {
    var i = 0
    var left = prefix
    while (left >= 8) {
      if (a(i) != b(i)) return false
      i += 1; left -= 8
    }
    if (left == 0) return true
    val mask = (0xff << (8 - left)) & 0xff
    (a(i) & mask) == (b(i) & mask)
  }
}
