package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar's similarity hash; public
  * algorithm — see Manku et al., "Detecting Near-Duplicates for Web
  * Crawling", WWW'07). For each token, a 64-bit hash votes ±1 on each bit
  * position; the fingerprint takes the sign of each accumulator. Hamming
  * distance between fingerprints approximates token-multiset cosine.
  *
  * Part of the LLM-training-pipeline dedup suite (near-dup detection at
  * 100 TB: fingerprint is one long per document, so candidate search is a
  * cheap self-join on fingerprint bands instead of pairwise text compare).
  *
  * Token hash = FNV-1a over UTF-8 bytes, mixed with splitmix64 — stable
  * across JVMs (never `String.hashCode`).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(a.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHash64.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit SimHash with a CROSS-ENGINE hash basis: token base hash = the
  * same polynomial fold DuckDB's `list_reduce` computes, bit weights = 60
  * affine rehashes of it (Carter-Wegman style, as in q45's minhash). Same
  * Charikar majority-vote construction as [[SimHash64]]; 60 bits (not 64)
  * keep every intermediate inside positive BIGINT range on both engines.
  * Exists so the banded near-dup query is ORACLE-GATED end-to-end instead
  * of rows-only; [[SimHash64]] (FNV basis) remains the
  * better-mixing default for production use.
  */
case class SimHashPoly(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_poly"

  override def nullSafeEval(a: Any): Any =
    java.lang.Long.valueOf(SimHashPoly.compute(a.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHashPoly.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashPoly {
  final val Bits = 60
  private final val M = 2147483647L

  /** Static so generated code can call it with a single invoke. */
  def compute(tokens: ArrayData): Long = {
    val acc = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < s.length) { h = (h * 257 + s.charAt(j)) % M; j += 1 }
        var b = 0
        while (b < Bits) {
          val g = (h * (2 * b + 3) + 8191L * b + 7) % M
          if ((g & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

object SimHash64 {
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashToken(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    splitmix64(h)
  }

  /** Static so generated code can call it with a single invoke. */
  def compute(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
