package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Roaring-style compressed bitmap over the unsigned-32-bit domain — the
  * engine behind ClickHouse's `groupBitmap` / `bitmap*` family (audience
  * segmentation, retention-by-set-algebra). Two-level: values are split
  * into a 16-bit high key and a 16-bit low part; each high key owns ONE
  * container, which is either a sorted `Array[Char]` (cardinality <=
  * 4096, <= 8 KB) or a 65536-bit bitset (exactly 8 KB). Containers are
  * kept CANONICAL — array iff cardinality <= 4096 — so equal sets always
  * serialize to identical bytes, which is what lets specs compare
  * serialized states and lets a bitmap column hash-gate. The layout
  * follows the public Roaring bitmap design (Chambi et al., "Better
  * bitmap performance with Roaring bitmaps", 2016); run containers are
  * deliberately omitted (canonical form would then depend on run
  * heuristics).
  *
  * Scale contract: state is O(distinct values), never O(rows) — at 100 TB
  * a per-group bitmap of user ids is bounded by the user population
  * (4 B ids max = 512 MB worst case, dense), and merges are
  * container-wise word ops. Values outside [0, 2^32) fail LOUDLY —
  * ClickHouse's bitmaps are UInt32 roaring for the same reason.
  */
final class Bitmap32 extends Serializable {
  import Bitmap32._

  private[graft] var nKeys: Int = 0
  private[graft] var highs: Array[Int] = new Array[Int](4)
  private[graft] var conts: Array[AnyRef] = new Array[AnyRef](4)

  /** Index of `hi` in highs[0, nKeys), or -(insertion point)-1. */
  private def find(hi: Int): Int = {
    var lo = 0
    var up = nKeys - 1
    while (lo <= up) {
      val mid = (lo + up) >>> 1
      val v = highs(mid)
      if (v < hi) lo = mid + 1
      else if (v > hi) up = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  private def insertAt(pos: Int, hi: Int, cont: AnyRef): Unit = {
    if (nKeys == highs.length) {
      highs = java.util.Arrays.copyOf(highs, nKeys * 2)
      conts = java.util.Arrays.copyOf(conts, nKeys * 2)
    }
    System.arraycopy(highs, pos, highs, pos + 1, nKeys - pos)
    System.arraycopy(conts, pos, conts, pos + 1, nKeys - pos)
    highs(pos) = hi
    conts(pos) = cont
    nKeys += 1
  }

  def add(value: Long): Unit = {
    require(value >= 0L && value <= 0xFFFFFFFFL,
      s"bitmap values must be in [0, 2^32), got $value (the bitmap domain " +
        "is unsigned 32-bit, as in ClickHouse's roaring bitmaps)")
    val hi = (value >>> 16).toInt
    val lo = (value & 0xFFFFL).toChar
    val idx = find(hi)
    if (idx < 0) {
      val a = new ArrCont(new Array[Char](4), 0)
      a.insert(lo)
      insertAt(-idx - 1, hi, a)
    } else conts(idx) match {
      case a: ArrCont =>
        if (a.insert(lo) && a.n > ArrayMax) conts(idx) = a.toBits
      case b: BitCont => b.set(lo)
    }
  }

  def cardinality: Long = {
    var c = 0L
    var i = 0
    while (i < nKeys) { c += contCard(conts(i)); i += 1 }
    c
  }

  def isEmpty: Boolean = nKeys == 0

  def contains(value: Long): Boolean = {
    if (value < 0L || value > 0xFFFFFFFFL) return false
    val idx = find((value >>> 16).toInt)
    idx >= 0 && (conts(idx) match {
      case a: ArrCont => a.contains((value & 0xFFFFL).toChar)
      case b: BitCont => b.get((value & 0xFFFFL).toChar)
    })
  }

  /** Smallest value; UINT32_MAX on empty (ClickHouse bitmapMin contract). */
  def min: Long =
    if (nKeys == 0) 0xFFFFFFFFL
    else (highs(0).toLong << 16) | contMin(conts(0))

  /** Largest value; 0 on empty (ClickHouse bitmapMax contract). */
  def max: Long =
    if (nKeys == 0) 0L
    else (highs(nKeys - 1).toLong << 16) | contMax(conts(nKeys - 1))

  def toLongArray: Array[Long] = {
    val out = new Array[Long](cardinality.toInt)
    var w = 0
    var i = 0
    while (i < nKeys) {
      val base = highs(i).toLong << 16
      conts(i) match {
        case a: ArrCont =>
          var j = 0
          while (j < a.n) { out(w) = base | a.a(j); w += 1; j += 1 }
        case b: BitCont =>
          var word = 0
          while (word < 1024) {
            var bits = b.words(word)
            while (bits != 0L) {
              val t = bits & -bits
              out(w) = base | (word * 64 + java.lang.Long.numberOfTrailingZeros(bits))
              w += 1
              bits ^= t
            }
            word += 1
          }
      }
      i += 1
    }
    out
  }

  /** Union `o` into this bitmap. `o` must be OWNED by the caller (its
    * containers may be adopted) — both aggregate call sites pass a
    * freshly-deserialized bitmap.
    */
  def orInPlace(o: Bitmap32): Unit = {
    var i = 0
    while (i < o.nKeys) {
      val hi = o.highs(i)
      val idx = find(hi)
      if (idx < 0) insertAt(-idx - 1, hi, o.conts(i))
      else conts(idx) = orCont(conts(idx), o.conts(i))
      i += 1
    }
  }

  /** True iff every element of `o` is in this bitmap. */
  def hasAll(o: Bitmap32): Boolean = {
    var i = 0
    while (i < o.nKeys) {
      val idx = find(o.highs(i))
      if (idx < 0 || !contSubset(o.conts(i), conts(idx))) return false
      i += 1
    }
    true
  }

  def hasAny(o: Bitmap32): Boolean = {
    var i = 0
    while (i < o.nKeys) {
      val idx = find(o.highs(i))
      if (idx >= 0 && contIntersectCard(conts(idx), o.conts(i)) > 0L) return true
      i += 1
    }
    false
  }

  /** `cardinalityLimit` elements starting at 0-based position `offset`
    * in ascending value order (ClickHouse `subBitmap`).
    */
  def subBitmap(offset: Long, limit: Long): Bitmap32 = {
    val out = new Bitmap32
    if (limit <= 0L) return out
    var skip = offset
    var take = limit
    var i = 0
    while (i < nKeys && take > 0L) {
      val card = contCard(conts(i))
      if (skip >= card) skip -= card
      else {
        val base = highs(i).toLong << 16
        val arr = contToChars(conts(i))
        var j = skip.toInt
        skip = 0L
        while (j < arr.length && take > 0L) {
          out.add(base | arr(j))
          take -= 1L
          j += 1
        }
      }
      i += 1
    }
    out
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(nKeys)
    var i = 0
    while (i < nKeys) {
      out.writeInt(highs(i))
      conts(i) match {
        case a: ArrCont =>
          out.writeByte(0)
          out.writeInt(a.n)
          var j = 0
          while (j < a.n) { out.writeChar(a.a(j)); j += 1 }
        case b: BitCont =>
          out.writeByte(1)
          out.writeInt(b.card)
          var w = 0
          while (w < 1024) { out.writeLong(b.words(w)); w += 1 }
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object Bitmap32 {
  /** Canonical array-container ceiling (Roaring's 4096). */
  final val ArrayMax = 4096

  /** Sorted unique low-16 values; canonical iff n <= ArrayMax. */
  private[graft] final class ArrCont(var a: Array[Char], var n: Int) {
    def contains(lo: Char): Boolean = search(lo) >= 0

    private def search(lo: Char): Int = {
      var l = 0
      var u = n - 1
      while (l <= u) {
        val mid = (l + u) >>> 1
        if (a(mid) < lo) l = mid + 1
        else if (a(mid) > lo) u = mid - 1
        else return mid
      }
      -(l + 1)
    }

    /** Insert keeping sort order; true if newly added. */
    def insert(lo: Char): Boolean = {
      val idx = search(lo)
      if (idx >= 0) return false
      val pos = -idx - 1
      if (n == a.length) a = java.util.Arrays.copyOf(a, math.max(4, n * 2))
      System.arraycopy(a, pos, a, pos + 1, n - pos)
      a(pos) = lo
      n += 1
      true
    }

    def toBits: BitCont = {
      val b = new BitCont(new Array[Long](1024), n)
      var j = 0
      while (j < n) { b.words(a(j) >>> 6) |= 1L << (a(j) & 63); j += 1 }
      b
    }
  }

  /** 65536-bit container; canonical iff card > ArrayMax. */
  private[graft] final class BitCont(val words: Array[Long], var card: Int) {
    def get(lo: Char): Boolean = (words(lo >>> 6) & (1L << (lo & 63))) != 0L

    def set(lo: Char): Unit = {
      val w = lo >>> 6
      val m = 1L << (lo & 63)
      if ((words(w) & m) == 0L) { words(w) |= m; card += 1 }
    }

    def toArr: ArrCont = {
      val out = new Array[Char](card)
      var n = 0
      var w = 0
      while (w < 1024) {
        var bits = words(w)
        while (bits != 0L) {
          out(n) = (w * 64 + java.lang.Long.numberOfTrailingZeros(bits)).toChar
          n += 1
          bits &= bits - 1
        }
        w += 1
      }
      new ArrCont(out, card)
    }
  }

  private[graft] def contCard(c: AnyRef): Long = c match {
    case a: ArrCont => a.n.toLong
    case b: BitCont => b.card.toLong
  }

  private def contMin(c: AnyRef): Long = c match {
    case a: ArrCont => a.a(0).toLong
    case b: BitCont =>
      var w = 0
      while (b.words(w) == 0L) w += 1
      w * 64L + java.lang.Long.numberOfTrailingZeros(b.words(w))
  }

  private def contMax(c: AnyRef): Long = c match {
    case a: ArrCont => a.a(a.n - 1).toLong
    case b: BitCont =>
      var w = 1023
      while (b.words(w) == 0L) w -= 1
      w * 64L + 63L - java.lang.Long.numberOfLeadingZeros(b.words(w))
  }

  private[graft] def contToChars(c: AnyRef): Array[Char] = c match {
    case a: ArrCont => java.util.Arrays.copyOf(a.a, a.n)
    case b: BitCont => { val t = b.toArr; java.util.Arrays.copyOf(t.a, t.n) }
  }

  /** Canonicalize: array iff card <= ArrayMax; null iff empty. */
  private def canon(c: AnyRef): AnyRef = c match {
    case a: ArrCont => if (a.n == 0) null else if (a.n > ArrayMax) a.toBits else a
    case b: BitCont => if (b.card == 0) null else if (b.card <= ArrayMax) b.toArr else b
  }

  /** Union of two containers; may mutate and return `x`. */
  private[graft] def orCont(x: AnyRef, y: AnyRef): AnyRef = (x, y) match {
    case (bx: BitCont, by: BitCont) =>
      var c = 0
      var w = 0
      while (w < 1024) {
        bx.words(w) |= by.words(w)
        c += java.lang.Long.bitCount(bx.words(w))
        w += 1
      }
      bx.card = c
      bx
    case (bx: BitCont, ay: ArrCont) =>
      var j = 0
      while (j < ay.n) { bx.set(ay.a(j)); j += 1 }
      bx
    case (ax: ArrCont, by: BitCont) =>
      val b = new BitCont(java.util.Arrays.copyOf(by.words, 1024), by.card)
      var j = 0
      while (j < ax.n) { b.set(ax.a(j)); j += 1 }
      b
    case (ax: ArrCont, ay: ArrCont) =>
      val m = new Array[Char](ax.n + ay.n)
      var i = 0
      var j = 0
      var n = 0
      while (i < ax.n && j < ay.n) {
        if (ax.a(i) < ay.a(j)) { m(n) = ax.a(i); i += 1 }
        else if (ax.a(i) > ay.a(j)) { m(n) = ay.a(j); j += 1 }
        else { m(n) = ax.a(i); i += 1; j += 1 }
        n += 1
      }
      while (i < ax.n) { m(n) = ax.a(i); i += 1; n += 1 }
      while (j < ay.n) { m(n) = ay.a(j); j += 1; n += 1 }
      val merged = new ArrCont(m, n)
      if (n > ArrayMax) merged.toBits else merged
  }

  /** Intersection (functional; canonical result, null iff empty). */
  private def andCont(x: AnyRef, y: AnyRef): AnyRef = (x, y) match {
    case (bx: BitCont, by: BitCont) =>
      val words = new Array[Long](1024)
      var c = 0
      var w = 0
      while (w < 1024) {
        words(w) = bx.words(w) & by.words(w)
        c += java.lang.Long.bitCount(words(w))
        w += 1
      }
      canon(new BitCont(words, c))
    case (ax: ArrCont, by: BitCont) =>
      val out = new Array[Char](ax.n)
      var n = 0
      var j = 0
      while (j < ax.n) {
        if (by.get(ax.a(j))) { out(n) = ax.a(j); n += 1 }
        j += 1
      }
      canon(new ArrCont(out, n))
    case (_: BitCont, _: ArrCont) => andCont(y, x)
    case (ax: ArrCont, ay: ArrCont) =>
      val out = new Array[Char](math.min(ax.n, ay.n))
      var i = 0
      var j = 0
      var n = 0
      while (i < ax.n && j < ay.n) {
        if (ax.a(i) < ay.a(j)) i += 1
        else if (ax.a(i) > ay.a(j)) j += 1
        else { out(n) = ax.a(i); n += 1; i += 1; j += 1 }
      }
      canon(new ArrCont(out, n))
  }

  private[graft] def contIntersectCard(x: AnyRef, y: AnyRef): Long = (x, y) match {
    case (bx: BitCont, by: BitCont) =>
      var c = 0L
      var w = 0
      while (w < 1024) { c += java.lang.Long.bitCount(bx.words(w) & by.words(w)); w += 1 }
      c
    case (ax: ArrCont, by: BitCont) =>
      var c = 0L
      var j = 0
      while (j < ax.n) { if (by.get(ax.a(j))) c += 1L; j += 1 }
      c
    case (_: BitCont, _: ArrCont) => contIntersectCard(y, x)
    case (ax: ArrCont, ay: ArrCont) =>
      var c = 0L
      var i = 0
      var j = 0
      while (i < ax.n && j < ay.n) {
        if (ax.a(i) < ay.a(j)) i += 1
        else if (ax.a(i) > ay.a(j)) j += 1
        else { c += 1L; i += 1; j += 1 }
      }
      c
  }

  /** True iff x ⊆ y. Canonical form guarantees a BitCont can never be a
    * subset of an ArrCont (card 4097+ vs <= 4096).
    */
  private def contSubset(x: AnyRef, y: AnyRef): Boolean =
    contIntersectCard(x, y) == contCard(x)

  private def xorCont(x: AnyRef, y: AnyRef): AnyRef = (x, y) match {
    case (bx: BitCont, by: BitCont) =>
      val words = new Array[Long](1024)
      var c = 0
      var w = 0
      while (w < 1024) {
        words(w) = bx.words(w) ^ by.words(w)
        c += java.lang.Long.bitCount(words(w))
        w += 1
      }
      canon(new BitCont(words, c))
    case (ax: ArrCont, ay: ArrCont) =>
      val out = new Array[Char](ax.n + ay.n)
      var i = 0
      var j = 0
      var n = 0
      while (i < ax.n && j < ay.n) {
        if (ax.a(i) < ay.a(j)) { out(n) = ax.a(i); n += 1; i += 1 }
        else if (ax.a(i) > ay.a(j)) { out(n) = ay.a(j); n += 1; j += 1 }
        else { i += 1; j += 1 }
      }
      while (i < ax.n) { out(n) = ax.a(i); n += 1; i += 1 }
      while (j < ay.n) { out(n) = ay.a(j); n += 1; j += 1 }
      canon(new ArrCont(out, n))
    case _ => // mixed: widen the array side to bits, then bit-xor
      val bx = x match { case a: ArrCont => a.toBits; case b: BitCont => b }
      val by = y match { case a: ArrCont => a.toBits; case b: BitCont => b }
      xorCont(bx, by)
  }

  /** x \ y (functional; canonical, null iff empty). */
  private def andNotCont(x: AnyRef, y: AnyRef): AnyRef = (x, y) match {
    case (ax: ArrCont, ay: ArrCont) =>
      val out = new Array[Char](ax.n)
      var i = 0
      var j = 0
      var n = 0
      while (i < ax.n) {
        while (j < ay.n && ay.a(j) < ax.a(i)) j += 1
        if (j >= ay.n || ay.a(j) != ax.a(i)) { out(n) = ax.a(i); n += 1 }
        i += 1
      }
      canon(new ArrCont(out, n))
    case (ax: ArrCont, by: BitCont) =>
      val out = new Array[Char](ax.n)
      var n = 0
      var j = 0
      while (j < ax.n) {
        if (!by.get(ax.a(j))) { out(n) = ax.a(j); n += 1 }
        j += 1
      }
      canon(new ArrCont(out, n))
    case (bx: BitCont, ay: ArrCont) =>
      val words = java.util.Arrays.copyOf(bx.words, 1024)
      var c = bx.card
      var j = 0
      while (j < ay.n) {
        val w = ay.a(j) >>> 6
        val m = 1L << (ay.a(j) & 63)
        if ((words(w) & m) != 0L) { words(w) &= ~m; c -= 1 }
        j += 1
      }
      canon(new BitCont(words, c))
    case (bx: BitCont, by: BitCont) =>
      val words = new Array[Long](1024)
      var c = 0
      var w = 0
      while (w < 1024) {
        words(w) = bx.words(w) & ~by.words(w)
        c += java.lang.Long.bitCount(words(w))
        w += 1
      }
      canon(new BitCont(words, c))
  }

  private def setOp(a: Bitmap32, b: Bitmap32,
      op: (AnyRef, AnyRef) => AnyRef, keepLeft: Boolean, keepRight: Boolean): Bitmap32 = {
    val out = new Bitmap32
    out.highs = new Array[Int](a.nKeys + b.nKeys)
    out.conts = new Array[AnyRef](a.nKeys + b.nKeys)
    var i = 0
    var j = 0
    var n = 0
    def put(hi: Int, c: AnyRef): Unit =
      if (c != null) { out.highs(n) = hi; out.conts(n) = c; n += 1 }
    while (i < a.nKeys && j < b.nKeys) {
      if (a.highs(i) < b.highs(j)) {
        if (keepLeft) put(a.highs(i), copyCont(a.conts(i)))
        i += 1
      } else if (a.highs(i) > b.highs(j)) {
        if (keepRight) put(b.highs(j), copyCont(b.conts(j)))
        j += 1
      } else {
        put(a.highs(i), op(a.conts(i), b.conts(j)))
        i += 1
        j += 1
      }
    }
    while (i < a.nKeys) { if (keepLeft) put(a.highs(i), copyCont(a.conts(i))); i += 1 }
    while (j < b.nKeys) { if (keepRight) put(b.highs(j), copyCont(b.conts(j))); j += 1 }
    out.nKeys = n
    out
  }

  private def copyCont(c: AnyRef): AnyRef = c match {
    case a: ArrCont => new ArrCont(java.util.Arrays.copyOf(a.a, a.n), a.n)
    case b: BitCont => new BitCont(java.util.Arrays.copyOf(b.words, 1024), b.card)
  }

  def and(a: Bitmap32, b: Bitmap32): Bitmap32 =
    setOp(a, b, andCont, keepLeft = false, keepRight = false)

  def or(a: Bitmap32, b: Bitmap32): Bitmap32 =
    setOp(a, b, (x, y) => orCont(copyCont(x), y), keepLeft = true, keepRight = true)

  def xor(a: Bitmap32, b: Bitmap32): Bitmap32 =
    setOp(a, b, xorCont, keepLeft = true, keepRight = true)

  def andNot(a: Bitmap32, b: Bitmap32): Bitmap32 =
    setOp(a, b, andNotCont, keepLeft = true, keepRight = false)

  /** Count-only intersection — no result materialization; or/xor/andnot
    * cardinalities derive from it by inclusion–exclusion.
    */
  def andCardinality(a: Bitmap32, b: Bitmap32): Long = {
    var c = 0L
    var i = 0
    var j = 0
    while (i < a.nKeys && j < b.nKeys) {
      if (a.highs(i) < b.highs(j)) i += 1
      else if (a.highs(i) > b.highs(j)) j += 1
      else { c += contIntersectCard(a.conts(i), b.conts(j)); i += 1; j += 1 }
    }
    c
  }

  def deserialize(bytes: Array[Byte]): Bitmap32 = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val bm = new Bitmap32
    val n = in.readInt()
    bm.highs = new Array[Int](math.max(4, n))
    bm.conts = new Array[AnyRef](math.max(4, n))
    bm.nKeys = n
    var i = 0
    while (i < n) {
      bm.highs(i) = in.readInt()
      bm.conts(i) = in.readByte() match {
        case 0 =>
          val m = in.readInt()
          val a = new Array[Char](m)
          var j = 0
          while (j < m) { a(j) = in.readChar(); j += 1 }
          new ArrCont(a, m)
        case _ =>
          val card = in.readInt()
          val words = new Array[Long](1024)
          var w = 0
          while (w < 1024) { words(w) = in.readLong(); w += 1 }
          new BitCont(words, card)
      }
      i += 1
    }
    bm
  }
}

/** Static entry points for codegen'd scalar bitmap expressions (byte[] in,
  * byte[]/long/boolean out — the serialized form IS the column value, as
  * in ClickHouse's `AggregateFunction(groupBitmap, UInt32)` columns).
  */
object BitmapOps {
  private def de(b: Array[Byte]): Bitmap32 = Bitmap32.deserialize(b)

  def and(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Bitmap32.and(de(a), de(b)).serialize()
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Bitmap32.or(de(a), de(b)).serialize()
  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Bitmap32.xor(de(a), de(b)).serialize()
  def andnot(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Bitmap32.andNot(de(a), de(b)).serialize()

  def cardinality(a: Array[Byte]): Long = de(a).cardinality
  def andCard(a: Array[Byte], b: Array[Byte]): Long =
    Bitmap32.andCardinality(de(a), de(b))
  def orCard(a: Array[Byte], b: Array[Byte]): Long = {
    val x = de(a); val y = de(b)
    x.cardinality + y.cardinality - Bitmap32.andCardinality(x, y)
  }
  def xorCard(a: Array[Byte], b: Array[Byte]): Long = {
    val x = de(a); val y = de(b)
    x.cardinality + y.cardinality - 2L * Bitmap32.andCardinality(x, y)
  }
  def andnotCard(a: Array[Byte], b: Array[Byte]): Long = {
    val x = de(a); val y = de(b)
    x.cardinality - Bitmap32.andCardinality(x, y)
  }

  def bmMin(a: Array[Byte]): Long = de(a).min
  def bmMax(a: Array[Byte]): Long = de(a).max
  def contains(a: Array[Byte], v: Long): Boolean = de(a).contains(v)
  def hasAll(a: Array[Byte], b: Array[Byte]): Boolean = de(a).hasAll(de(b))
  def hasAny(a: Array[Byte], b: Array[Byte]): Boolean = de(a).hasAny(de(b))
  def toLongArray(a: Array[Byte]): Array[Long] = de(a).toLongArray
  def subBitmap(a: Array[Byte], offset: Long, limit: Long): Array[Byte] =
    de(a).subBitmap(offset, limit).serialize()

  /** CH bitmapSubsetInRange: members in [lo, hi). */
  def subsetInRange(a: Array[Byte], lo: Long, hi: Long): Array[Byte] = {
    val bm = new Bitmap32
    val arr = de(a).toLongArray
    var i = 0
    while (i < arr.length) {
      if (arr(i) >= lo && arr(i) < hi) bm.add(arr(i))
      i += 1
    }
    bm.serialize()
  }

  /** CH bitmapSubsetLimit: the first `limit` members >= start. */
  def subsetLimit(a: Array[Byte], start: Long, limit: Long): Array[Byte] = {
    val bm = new Bitmap32
    val arr = de(a).toLongArray // ascending (container order)
    var i = 0
    var n = 0L
    while (i < arr.length && n < limit) {
      if (arr(i) >= start) { bm.add(arr(i)); n += 1 }
      i += 1
    }
    bm.serialize()
  }

  def buildFromArray(arr: ArrayData): Array[Byte] = {
    val bm = new Bitmap32
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) bm.add(arr.getLong(i))
      i += 1
    }
    bm.serialize()
  }
}

// ---------------------------------------------------------------------------
// Aggregates
// ---------------------------------------------------------------------------

/** `groupBitmap(x)` / `groupBitmapState(x)`: exact distinct cardinality /
  * the serialized bitmap itself, over unsigned-32-bit integral values.
  * One shuffle, state O(distinct) — the set-algebra alternative to
  * count(DISTINCT) that STAYS composable (states and/or/xor downstream).
  */
case class GroupBitmapAgg(
    child: Expression,
    returnState: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap32] with UnaryLike[Expression] {

  override def prettyName: String =
    if (returnState) "group_bitmap_state" else "group_bitmap"
  override def nullable: Boolean = false
  override def dataType: DataType = if (returnState) BinaryType else LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral column (bigint/int/smallint), got $t")
  }

  override def createAggregationBuffer(): Bitmap32 = new Bitmap32

  override def update(buf: Bitmap32, input: InternalRow): Bitmap32 = {
    val v = child.eval(input)
    if (v != null) buf.add(Num.toL(v))
    buf
  }

  override def merge(b1: Bitmap32, b2: Bitmap32): Bitmap32 = {
    b1.orInPlace(b2)
    b1
  }

  override def eval(buf: Bitmap32): Any =
    if (returnState) buf.serialize() else buf.cardinality

  override def serialize(buf: Bitmap32): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Bitmap32 =
    Bitmap32.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): GroupBitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupBitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): GroupBitmapAgg =
    copy(child = c)
}

object BitmapMergeAgg {
  final val OpAnd = 0
  final val OpOr = 1
  final val OpXor = 2

  /** (initialized?, accumulated bitmap). AND has no identity element, so
    * the first bitmap seeds the state; OR/XOR seed identically (empty is
    * their identity, but seeding keeps the three ops symmetric).
    */
  final class State(var init: Boolean, var bm: Bitmap32)
}

/** `groupBitmapAnd/Or/Xor[State](bitmapColumn)`: fold serialized bitmap
  * states with a set operation; plain form returns the cardinality,
  * `*State` the folded bitmap (ClickHouse's split). Zero rows → empty
  * bitmap / 0.
  */
case class BitmapMergeAgg(
    child: Expression,
    op: Int,
    returnState: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapMergeAgg.State] with UnaryLike[Expression] {
  import BitmapMergeAgg._

  override def prettyName: String = {
    val base = op match {
      case OpAnd => "group_bitmap_and"
      case OpOr => "group_bitmap_or"
      case _ => "group_bitmap_xor"
    }
    if (returnState) base + "_state" else base
  }
  override def nullable: Boolean = false
  override def dataType: DataType = if (returnState) BinaryType else LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a serialized bitmap (binary) column, got $t")
  }

  override def createAggregationBuffer(): State = new State(false, new Bitmap32)

  private def combine(acc: Bitmap32, next: Bitmap32): Bitmap32 = op match {
    case OpAnd => Bitmap32.and(acc, next)
    case OpOr => { acc.orInPlace(next); acc }
    case _ => Bitmap32.xor(acc, next)
  }

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      val next = Bitmap32.deserialize(v.asInstanceOf[Array[Byte]])
      if (!buf.init) { buf.bm = next; buf.init = true }
      else buf.bm = combine(buf.bm, next)
    }
    buf
  }

  override def merge(b1: State, b2: State): State = {
    if (b2.init) {
      if (!b1.init) { b1.bm = b2.bm; b1.init = true }
      else b1.bm = combine(b1.bm, b2.bm)
    }
    b1
  }

  override def eval(buf: State): Any =
    if (returnState) buf.bm.serialize() else buf.bm.cardinality

  override def serialize(buf: State): Array[Byte] = {
    val bm = buf.bm.serialize()
    val out = new Array[Byte](bm.length + 1)
    out(0) = if (buf.init) 1 else 0
    System.arraycopy(bm, 0, out, 1, bm.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): State =
    new State(bytes(0) == 1,
      Bitmap32.deserialize(java.util.Arrays.copyOfRange(bytes, 1, bytes.length)))

  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapMergeAgg =
    copy(child = c)
}

// ---------------------------------------------------------------------------
// Scalar expressions (codegen'd through BitmapOps statics)
// ---------------------------------------------------------------------------

/** `bitmapBuild(array<bigint>)` → serialized bitmap. */
case class BitmapBuild(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_build"

  protected override def nullSafeEval(v: Any): Any =
    BitmapOps.buildFromArray(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BitmapOps.buildFromArray($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `bitmapToArray(bm)` → ascending array<bigint>. */
case class BitmapToArray(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_to_array"

  protected override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(BitmapOps.toLongArray(v.asInstanceOf[Array[Byte]]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"org.apache.spark.sql.graft.BitmapOps.toLongArray($c))")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Unary long-valued bitmap inspectors: cardinality / min / max. */
case class BitmapUnaryLong(child: Expression, fn: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"bitmap_$fn"

  protected override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    fn match {
      case "cardinality" => BitmapOps.cardinality(b)
      case "min" => BitmapOps.bmMin(b)
      case _ => BitmapOps.bmMax(b)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = fn match {
      case "cardinality" => "cardinality"
      case "min" => "bmMin"
      case _ => "bmMax"
    }
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.BitmapOps.$m($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Binary bitmap→bitmap set ops (and/or/xor/andnot). */
case class BitmapBinOp(left: Expression, right: Expression, fn: String)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"bitmap_$fn"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    fn match {
      case "and" => BitmapOps.and(x, y)
      case "or" => BitmapOps.or(x, y)
      case "xor" => BitmapOps.xor(x, y)
      case _ => BitmapOps.andnot(x, y)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.BitmapOps.$fn($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      Expression = copy(left = l, right = r)
}

/** Binary bitmap cardinality ops — count-only, no result bitmap built. */
case class BitmapBinCard(left: Expression, right: Expression, fn: String)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"bitmap_${fn}_cardinality"

  private def method: String = fn match {
    case "and" => "andCard"
    case "or" => "orCard"
    case "xor" => "xorCard"
    case _ => "andnotCard"
  }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    fn match {
      case "and" => BitmapOps.andCard(x, y)
      case "or" => BitmapOps.orCard(x, y)
      case "xor" => BitmapOps.xorCard(x, y)
      case _ => BitmapOps.andnotCard(x, y)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.BitmapOps.$method($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      Expression = copy(left = l, right = r)
}

/** `bitmapContains(bm, v)` — membership probe. */
case class BitmapContains(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_contains"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.contains(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.BitmapOps.contains($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      Expression = copy(left = l, right = r)
}

/** `bitmapHasAll(a, b)` (b ⊆ a) / `bitmapHasAny(a, b)` (a ∩ b ≠ ∅). */
case class BitmapHas(left: Expression, right: Expression, all: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (all) "bitmap_has_all" else "bitmap_has_any"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (all) BitmapOps.hasAll(x, y) else BitmapOps.hasAny(x, y)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (all) "hasAll" else "hasAny"
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.BitmapOps.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      Expression = copy(left = l, right = r)
}

/** `subBitmap(bm, offset, cardinalityLimit)` — ascending slice. */
case class SubBitmap(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sub_bitmap"

  protected override def nullSafeEval(a: Any, off: Any, lim: Any): Any =
    BitmapOps.subBitmap(a.asInstanceOf[Array[Byte]],
      off.asInstanceOf[Long], lim.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, o, l) =>
      s"org.apache.spark.sql.graft.BitmapOps.subBitmap($a, $o, $l)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `bitmapSubsetInRange(bm, lo, hi)` — members in [lo, hi) as a bitmap. */
case class BitmapSubsetInRange(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_subset_in_range"

  protected override def nullSafeEval(a: Any, lo: Any, hi: Any): Any =
    BitmapOps.subsetInRange(a.asInstanceOf[Array[Byte]],
      lo.asInstanceOf[Long], hi.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, lo, hi) =>
      s"org.apache.spark.sql.graft.BitmapOps.subsetInRange($a, $lo, $hi)")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(first = a, second = b, third = c)
}

/** `bitmapSubsetLimit(bm, start, limit)` — first `limit` members >= start. */
case class BitmapSubsetLimit(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_subset_limit"

  protected override def nullSafeEval(a: Any, s: Any, l: Any): Any =
    BitmapOps.subsetLimit(a.asInstanceOf[Array[Byte]],
      s.asInstanceOf[Long], l.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s, l) =>
      s"org.apache.spark.sql.graft.BitmapOps.subsetLimit($a, $s, $l)")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(first = a, second = b, third = c)
}
