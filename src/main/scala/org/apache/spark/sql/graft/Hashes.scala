package org.apache.spark.sql.graft

import org.apache.spark.unsafe.types.UTF8String

/** SipHash-2-4 (Aumasson & Bernstein 2012, reference algorithm) — the
  * hash behind ClickHouse's `sipHash64`/`sipHash128`. CH runs it with
  * the zero key; [[HashesSpec]] pins this implementation against the
  * paper's published test vectors (keyed) before trusting the zero-key
  * configuration. Byte-exact for single STRING arguments — the shape
  * every sharding/sampling expression in the dialect uses.
  */
object SipHash {

  private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** SipHash-2-4 of `data` under key (k0, k1). */
  def hash64(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m
      round(); round()
      v0 ^= m
      i += 8
    }
    var b = n.toLong << 56
    var j = n - end - 1
    while (j >= 0) { b |= (data(end + j) & 0xffL) << (8 * j); j -= 1 }
    v3 ^= b
    round(); round()
    v0 ^= b
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** The 128-bit variant (outputs two words, per the reference's
    * SipHash-2-4-128: v1 ^= 0xee initial, 0xee/0xdd finalization).
    */
  def hash128(k0: Long, k1: Long, data: Array[Byte]): (Long, Long) = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1 ^ 0xee
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m
      round(); round()
      v0 ^= m
      i += 8
    }
    var b = n.toLong << 56
    var j = n - end - 1
    while (j >= 0) { b |= (data(end + j) & 0xffL) << (8 * j); j -= 1 }
    v3 ^= b
    round(); round()
    v0 ^= b
    v2 ^= 0xee
    round(); round(); round(); round()
    val h1 = v0 ^ v1 ^ v2 ^ v3
    v1 ^= 0xdd
    round(); round(); round(); round()
    val h2 = v0 ^ v1 ^ v2 ^ v3
    (h1, h2)
  }

  // --- registry-facing statics (CH zero key) ---------------------------

  def sip64(s: UTF8String): Long = hash64(0L, 0L, s.getBytes)

  /** 16 bytes, little-endian words like CH's FixedString(16) output. */
  def sip128(s: UTF8String): Array[Byte] = {
    val (a, b) = hash128(0L, 0L, s.getBytes)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) { out(i) = ((a >>> (8 * i)) & 0xff).toByte; i += 1 }
    while (i < 16) { out(i) = ((b >>> (8 * (i - 8))) & 0xff).toByte; i += 1 }
    out
  }

  /** Multi-arg combination: hash of the length-prefixed concatenation of
    * per-arg hashes — graft-stable (documented; CH's own multi-arg
    * combiner differs).
    */
  def sip64Combine(prev: Long, next: Long): Long = {
    val b = new Array[Byte](16)
    var i = 0
    while (i < 8) { b(i) = ((prev >>> (8 * i)) & 0xff).toByte; i += 1 }
    while (i < 16) { b(i) = ((next >>> (8 * (i - 8))) & 0xff).toByte; i += 1 }
    hash64(0L, 0L, b)
  }

  /** (min, max) of the per-gram sip64 hashes — the CH
    * ngramMinHash/wordShingleMinHash SHAPE (graft-defined bits).
    */
  def minMaxHash(grams: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = grams.numElements()
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val h = sip64(grams.getUTF8String(i))
        if (h < mn) mn = h
        if (h > mx) mx = h
      }
      i += 1
    }
    if (mn == Long.MaxValue) { mn = 0L; mx = 0L } // empty input
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mn, mx))
  }
}

/** MurmurHash3 x86_32 (Appleby's public reference algorithm) over raw
  * bytes with an explicit seed. Guava (on the Spark classpath) carries
  * the CANONICAL implementation, which gives an OFFLINE verification
  * oracle: DialectClosureSpec asserts byte-for-byte agreement with
  * Guava across lengths (every tail case) and seeds, then
  * `murmurHash3_32` runs at seed 0 — ClickHouse's configuration.
  * (Spark's own Murmur3_x86_32 would NOT serve: its byte-tail handling
  * deliberately deviates from the reference.)
  */
object Murmur3 {
  def x86_32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      var k1 = (data(i * 4) & 0xff) | ((data(i * 4 + 1) & 0xff) << 8) |
        ((data(i * 4 + 2) & 0xff) << 16) | ((data(i * 4 + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // finalization
    h1 ^= data.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** CH murmurHash3_32: seed 0 over the UTF-8 bytes, as UInt32. */
  def murmur3_32(s: UTF8String): Long = x86_32(s.getBytes, 0) & 0xffffffffL

  /** CH murmurHash3_128: MurmurHash3 x64_128 at seed 0 over the UTF-8
    * bytes, 16 bytes out (h1 then h2, little-endian — CH memcpys the two
    * u64s the same way). No port at all here: Guava's murmur3_128 on the
    * Spark classpath IS the canonical implementation (verified against
    * Appleby's reference vectors upstream), called directly — the same
    * offline-oracle standard that admitted murmurHash3_32.
    */
  def murmur3_128(s: UTF8String): Array[Byte] =
    com.google.common.hash.Hashing.murmur3_128(0).hashBytes(s.getBytes).asBytes()

  /** CH xxHash32/xxHash64: Yann Collet's xxHash at seed 0 over the
    * UTF-8 bytes. No port: lz4-java on the Spark classpath carries the
    * canonical pure-Java implementation (upstream-verified against the
    * reference vectors) — the same offline-oracle standard as the
    * murmur3 pair. Instances are stateless and thread-safe. (Spark's
    * own `xxhash64` uses seed 42 with Spark's type-specific row
    * encoding — different bytes by design; the Column function keeps
    * those semantics, the CH dialect name gets CH's.)
    */
  private val xxFactory = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()
  private val xx32 = xxFactory.hash32()
  private val xx64 = xxFactory.hash64()

  def xxHash32(s: UTF8String): Long = {
    val b = s.getBytes
    xx32.hash(b, 0, b.length, 0) & 0xffffffffL
  }

  def xxHash64ch(s: UTF8String): Long = {
    val b = s.getBytes
    xx64.hash(b, 0, b.length, 0)
  }

  /** CH farmFingerprint64: FarmHash Fingerprint64 over the UTF-8 bytes
    * — Guava's farmHashFingerprint64 IS the canonical implementation
    * (upstream-verified). CH's farmHash64 (farmhash::Hash64, a
    * DIFFERENT function that is seed/platform-tuned) remains excluded.
    */
  def farmFingerprint64(s: UTF8String): Long =
    com.google.common.hash.Hashing.farmHashFingerprint64()
      .hashBytes(s.getBytes).asLong()
}
