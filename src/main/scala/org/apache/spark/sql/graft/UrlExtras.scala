package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** URL dialect tail (CH "URL functions") — the parts regexps can't do
  * in one pass: percent-codecs, progressive hierarchies, and the
  * significant-subdomain heuristic (CH uses the public suffix list; a
  * pinned common-suffix set keeps this deterministic and offline —
  * divergence is possible on exotic ccTLD second-level domains and is
  * documented at the registration site).
  */
object UrlOps {

  /** Percent-decoding, UTF-8, '+' NOT treated as space (CH semantics —
    * java.net.URLDecoder would eat '+'); malformed escapes pass through.
    */
  def decodeUrlComponent(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    def hex(b: Byte): Int =
      if (b >= '0' && b <= '9') b - '0'
      else if (b >= 'a' && b <= 'f') b - 'a' + 10
      else if (b >= 'A' && b <= 'F') b - 'A' + 10
      else -1
    while (i < in.length) {
      val c = in(i)
      if (c == '%' && i + 2 < in.length) {
        val h = hex(in(i + 1)); val l = hex(in(i + 2))
        if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
        else { out.write(c); i += 1 }
      } else { out.write(c); i += 1 }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Percent-encoding: RFC 3986 unreserved [A-Za-z0-9-._~] kept,
    * everything else %XX (uppercase) per UTF-8 byte.
    */
  def encodeUrlComponent(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val sb = new java.lang.StringBuilder(in.length * 3)
    val hexd = "0123456789ABCDEF"
    var i = 0
    while (i < in.length) {
      val b = in(i) & 0xff
      val c = b.toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~')
        sb.append(c)
      else {
        sb.append('%').append(hexd(b >>> 4)).append(hexd(b & 0xf))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Boundaries are '/' (prefix keeps the slash) and '?' (prefix stops
    * before it) — CH's documented cut set; the final element is the whole
    * string (fragment included).
    */
  private def hierarchyFrom(url: String, start: Int): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var i = start
    while (i < url.length) {
      val c = url.charAt(i)
      if (c == '/') out += url.substring(0, i + 1) // prefix INCLUDING '/'
      else if (c == '?') {
        val cut = url.substring(0, i)
        if (out.isEmpty || out.last != cut) out += cut
      }
      i += 1
    }
    if (out.isEmpty || out.last != url) out += url
    out.toArray
  }

  /** CH URLHierarchy: progressive prefixes cut at '/'-boundaries in the
    * path and at '?' — ['https://h/', 'https://h/a/', 'https://h/a/b',
    * 'https://h/a/b?q'].
    */
  def urlHierarchy(u: UTF8String): GenericArrayData = {
    val url = u.toString
    // start of the path: after scheme://host
    val schemeEnd = {
      val m = url.indexOf("//")
      if (m < 0) 0
      else {
        val slash = url.indexOf('/', m + 2)
        if (slash < 0) url.length else slash
      }
    }
    if (schemeEnd >= url.length)
      return new GenericArrayData(Array[Any](UTF8String.fromString(url)))
    new GenericArrayData(
      hierarchyFrom(url, schemeEnd).map(s => UTF8String.fromString(s): Any))
  }

  /** CH URLPathHierarchy: same, path+query only — ['/a/', '/a/b',
    * '/a/b?q'].
    */
  def urlPathHierarchy(u: UTF8String): GenericArrayData = {
    val url = u.toString
    val m = url.indexOf("//")
    val pathStart =
      if (m < 0) 0
      else {
        val slash = url.indexOf('/', m + 2)
        if (slash < 0) return new GenericArrayData(Array.empty[Any]) else slash
      }
    val path = url.substring(pathStart)
    if (path.isEmpty) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(
      hierarchyFrom(path, 1).map(s => UTF8String.fromString(s): Any))
  }

  /** Known second-level public-suffix labels (the CH heuristic set). */
  private val Sld = Set("com", "net", "org", "co", "gov", "edu", "ac",
    "mil", "biz", "info")

  private def significantIndex(labels: Array[String]): Int =
    if (labels.length >= 3 && Sld.contains(labels(labels.length - 2)))
      labels.length - 3
    else labels.length - 2

  /** firstSignificantSubdomain of a HOST: 'news.clickhouse.com.tr' ->
    * 'clickhouse'; 'a.b.example.com' -> 'example'.
    */
  def firstSignificantSubdomain(host: UTF8String): UTF8String = {
    val labels = host.toString.split("\\.")
    if (labels.length < 2) return UTF8String.EMPTY_UTF8
    UTF8String.fromString(labels(significantIndex(labels)))
  }

  /** cutToFirstSignificantSubdomain: that label through the end —
    * 'clickhouse.com.tr', 'example.com'.
    */
  def cutToFirstSignificantSubdomain(host: UTF8String): UTF8String = {
    val labels = host.toString.split("\\.")
    if (labels.length < 2) return UTF8String.EMPTY_UTF8
    UTF8String.fromString(
      labels.slice(significantIndex(labels), labels.length).mkString("."))
  }
}
