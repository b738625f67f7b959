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

/** Per-element polynomial string hash over a string array:
  * `h(s) = fold(chars(s), 0L, (acc, c) -> (acc * 257 + codepoint(c)) % mod)`
  * — EXACTLY the value the catalyst higher-order chain
  * `transform(sh, s -> aggregate(sequence(1, length(s)), 0L,
  * (acc, i) -> (acc * 257 + ascii(substring(s, i, 1))) % mod))`
  * computes (Spark's `ascii` returns the code point of a 1-char
  * substring; iteration here steps code points for the same value on
  * non-BMP input), and the same fold DuckDB's `list_reduce` oracle twin
  * computes. Exists because catalyst HOF lambdas evaluate INTERPRETED
  * per element (no whole-stage codegen), and the shingle-hash pass is
  * the data-proportional map phase of the LSH dedup queries — R17
  * profiling showed it dominating their 32-task stages. This is a
  * drop-in codegen replacement, bit-identical by construction and
  * oracle-gated end-to-end wherever it is used.
  */
case class PolyHashArr(child: Expression, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(mod > 0, s"poly_hash_arr: modulus must be positive, got $mod")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  // containsNull: a null ELEMENT hashes to null, exactly like the HOF
  // chain (aggregate over sequence(1, length(null)) is null) — r17
  // ADVICE: the previous containsNull=false + unguarded getUTF8String
  // would NPE where the chain yields null (unreachable from current
  // producers, but a semantic divergence a future caller could trip)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash_arr"

  override def nullSafeEval(a: Any): Any =
    PolyHashArr.compute(a.asInstanceOf[ArrayData], mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.PolyHashArr.compute($c, ${mod}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PolyHashArr {
  /** Static so generated code can call it with a single invoke. */
  private def hashOne(s: String, mod: Long): Long = {
    var h = 0L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      h = (h * 257 + cp) % mod
      j += Character.charCount(cp)
    }
    h
  }

  def compute(arr: ArrayData, mod: Long): ArrayData = {
    val n = arr.numElements()
    // null-element probe first: a null ELEMENT hashes to null — the
    // exact HOF-chain value (aggregate over a null string is null).
    // Our producers (transform/concat_ws) never emit null elements, so
    // the common case stays on the primitive unboxed path; the boxed
    // path only exists so a future caller cannot trip the r17 NPE
    // divergence (ADVICE item, PolyHashSpec pins it).
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        out(i) = hashOne(arr.getUTF8String(i).toString, mod)
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (arr.isNullAt(i)) null
          else hashOne(arr.getUTF8String(i).toString, mod)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** Carter-Wegman minhash signature over pre-hashed shingle values:
  * `sig[h] = array_min(transform(hv, x -> (x*(2h+1) + 7919h + 13) % mod))`
  * for h in 0..nHashes-1 — EXACTLY the catalyst chain
  * `transform(sequence(0, N-1), h -> array_min(transform(hv, ...)))`
  * the LSH dedup queries previously spelled inline (and the same affine
  * rehash family their DuckDB oracle twins compute). An empty input
  * yields all-null elements, matching `array_min` over an empty array.
  * Codegen replacement for the same reason as [[PolyHashArr]]: HOF
  * lambdas evaluate interpreted per element, and this chain is
  * nHashes × |hv| element evaluations per row on the dedup map phase.
  */
case class MinHashSig(child: Expression, nHashes: Int, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nHashes > 0 && mod > 0,
    s"minhash_sig: need nHashes > 0 and mod > 0, got $nHashes, $mod")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData], nHashes, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashSig.compute($c, $nHashes, ${mod}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSig {
  /** Static so generated code can call it with a single invoke. */
  def compute(hv: ArrayData, nHashes: Int, mod: Long): ArrayData = {
    val n = hv.numElements()
    // collect non-null inputs once (array_min SKIPS null elements; an
    // all-null or empty input yields a null min per slot)
    val xs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!hv.isNullAt(i)) { xs(m) = hv.getLong(i); m += 1 }
      i += 1
    }
    if (m == 0) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](nHashes))
    }
    val out = new Array[Long](nHashes)
    var h = 0
    while (h < nHashes) {
      val a = 2L * h + 1
      val b = 7919L * h + 13
      var best = Long.MaxValue
      i = 0
      while (i < m) {
        val v = (xs(i) * a + b) % mod
        if (v < best) best = v
        i += 1
      }
      out(h) = best
      h += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
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
