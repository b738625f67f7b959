package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Gates for the round-11 FnGap dialect closure (SURVEY §16): every
  * family that q214–q218 can't oracle (libm drift, no DuckDB twin, or
  * pure edge cases) is pinned here against reference values —
  * NIST/RFC test vectors where they exist (SHA-2, MD5, RFC 5952),
  * closed-form math elsewhere.
  */
class DialectClosureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def one(sql: String): Row = spark.sql(s"SELECT $sql").collect()(0)
  private def d(sql: String): Double = one(sql).getDouble(0)
  private def l(sql: String): Long = one(sql).getLong(0)
  private def s(sql: String): String = one(sql).getString(0)
  private def b(sql: String): Boolean = one(sql).getBoolean(0)

  test("special math: erf/erfc/lgamma/tgamma vs reference values") {
    assert(math.abs(d("erf(1.0)") - 0.8427007929497149) < 1e-7) // A&S 7.1
    assert(math.abs(d("erfc(1.0)") - 0.1572992070502851) < 1e-7)
    assert(math.abs(d("lgamma(5.0)") - math.log(24.0)) < 1e-12)
    assert(math.abs(d("tgamma(5.0)") - 24.0) < 1e-10)
    assert(math.abs(d("tgamma(0.5)") - math.sqrt(math.Pi)) < 1e-10)
    assert(d("tgamma(-1.0)").isNaN) // pole
    assert(math.abs(d("tgamma(-0.5)") - (-2.0 * math.sqrt(math.Pi))) < 1e-9)
  }

  test("hash family: published test vectors") {
    // FIPS 180-2 vectors for 'abc'
    assert(s("lower(hex(SHA256('abc')))") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(s("lower(hex(SHA224('abc')))") ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    // MD5('abc') = 900150983cd24fb0... -> first 8 bytes big-endian
    assert(l("halfMD5('abc')") == 0x900150983cd24fb0L)
    assert(one("javaHash('abc')").getInt(0) == "abc".hashCode)
    assert(one("hiveHash('abc')").getInt(0) == "abc".hashCode) // ascii = java
    // simhash spellings are graft-stable (not CH bytes) — pin determinism
    assert(l("ngramSimHash('hello world')") == l("ngramSimHash('hello world')"))
    assert(l("wordShingleSimHash('a b c')") != 0L)
  }

  test("murmur3 x86_32 agrees with Guava's canonical implementation") {
    import org.apache.spark.sql.graft.Murmur3
    // Guava (on the Spark classpath) implements CANONICAL murmur3_32 —
    // the offline verification oracle across lengths incl. every tail
    // case and seeds. (Spark's own Murmur3_x86_32 would NOT do: its
    // byte-tail handling deliberately deviates from the reference.)
    for (len <- 0 to 17; seed <- Seq(0, 42, 12345)) {
      val data = Array.tabulate[Byte](len)(i => (i * 31 + 7).toByte)
      val want = com.google.common.hash.Hashing.murmur3_32_fixed(seed)
        .hashBytes(data).asInt()
      assert(Murmur3.x86_32(data, seed) == want, s"len=$len seed=$seed")
    }
    assert(l("murmurHash3_32('abc')") >= 0L) // UInt32 range
    assert(l("murmurHash3_32('abc')") == l("murmurHash3_32('abc')"))
    // murmurHash3_128: no port at all — Guava's canonical x64_128 called
    // directly; pin the registration contract (16 bytes, seed 0 over
    // UTF-8, hex composition, CH's h1-then-h2 little-endian layout)
    val m128 = one("murmurHash3_128('foo')").getAs[Array[Byte]](0)
    assert(m128.length == 16)
    assert(m128.toSeq == com.google.common.hash.Hashing.murmur3_128(0)
      .hashString("foo", java.nio.charset.StandardCharsets.UTF_8)
      .asBytes().toSeq)
    assert(s("hex(murmurHash3_128('foo'))").length == 32)
    assert(s("hex(murmurHash3_128(''))") != s("hex(murmurHash3_128('x'))"))
    // xxHash32/xxHash64 (lz4-java canonical): pinned to the PUBLISHED
    // xxHash reference vectors (xxHash spec/README, seed 0)
    assert(l("xxHash32('')") == 0x02CC5D05L)
    assert(l("xxHash32('Nobody inspects the spammish repetition')") == 0xE2293B2FL)
    assert(l("xxHash64('')") == 0xEF46DB3751D8E999L)
    assert(l("xxHash64('Nobody inspects the spammish repetition')") ==
      0xFBCEA83C8A378BF1L)
    // multi-arg keeps Spark's seed-42 row-hash semantics
    assert(l("xxHash64('a', 'b')") == l("xxhash64('a', 'b')"))
    // farmFingerprint64: Guava's canonical FarmHash Fingerprint64
    assert(l("farmFingerprint64('abc')") ==
      com.google.common.hash.Hashing.farmHashFingerprint64()
        .hashString("abc", java.nio.charset.StandardCharsets.UTF_8).asLong())
    assert(l("farmFingerprint64('')") != l("farmFingerprint64('x')"))
  }

  test("IPv6: RFC 5952 canonical round-trips") {
    assert(s("IPv6NumToString(IPv6StringToNum('2001:DB8:0:0:8:800:200C:417A'))") ==
      "2001:db8::8:800:200c:417a") // RFC 5952 §4 example
    assert(s("IPv6NumToString(IPv6StringToNum('::1'))") == "::1")
    assert(s("IPv6NumToString(IPv6StringToNum('::'))") == "::")
    assert(s("IPv6NumToString(IPv6StringToNum('1:0:0:0:0:0:0:0'))") == "1::")
    assert(s("IPv6NumToString(IPv6StringToNum('::ffff:1.2.3.4'))") == "::ffff:102:304")
    assert(s("IPv6NumToString(IPv4ToIPv6(IPv4StringToNum('1.2.3.4')))") ==
      "::ffff:102:304")
    // leftmost-longest zero-run compression
    assert(s("IPv6NumToString(IPv6StringToNum('1:0:0:2:0:0:0:3'))") == "1:0:0:2::3")
    assert(b("isIPv6String('2001:db8::1')"))
    assert(!b("isIPv6String('2001:db8:::1')")) // two '::'
    assert(!b("isIPv6String('1.2.3.4')"))
    assert(!b("isIPv6String('12345::')")) // >4 hex digits
    intercept[Exception] { one("IPv6StringToNum('nope')") }
  }

  test("CIDR membership: v4 and v6, boundary prefixes") {
    assert(b("isIPAddressInRange('192.168.5.77', '192.168.5.0/24')"))
    assert(!b("isIPAddressInRange('192.168.6.1', '192.168.5.0/24')"))
    assert(b("isIPAddressInRange('10.0.0.1', '0.0.0.0/0')"))
    assert(b("isIPAddressInRange('1.2.3.4', '1.2.3.4/32')"))
    assert(b("isIPAddressInRange('2001:db8::1', '2001:db8::/32')"))
    assert(!b("isIPAddressInRange('2001:db9::1', '2001:db8::/32')"))
    assert(!b("isIPAddressInRange('junk', '1.2.3.0/24')"))
    val r = one("IPv4CIDRToRange(IPv4StringToNum('192.168.5.77'), 24) AS r")
      .getStruct(0)
    assert(r.getString(0) == "192.168.5.0" && r.getString(1) == "192.168.5.255")
  }

  test("Lp norms and normalize (libm-path, spec-pinned)") {
    assert(math.abs(d("LpDistance(array(1.0f, 2.0f), array(3.0f, 1.0f), 3.0)") -
      math.cbrt(8.0 + 1.0)) < 1e-12)
    assert(math.abs(d("LpNorm(array(3.0f, 4.0f), 2.0)") - 5.0) < 1e-12)
    intercept[Exception] { one("LpNorm(array(1.0f), 0.5)") } // p >= 1
    val n2 = one("normalizeL2(array(3.0f, 4.0f))").getSeq[Float](0)
    assert(n2 == Seq(0.6f, 0.8f))
    // zero vector passes through unchanged
    assert(one("normalizeL2(array(0.0f, 0.0f))").getSeq[Float](0) == Seq(0.0f, 0.0f))
  }

  test("URL codecs: '+' survives decode, RFC 3986 unreserved survive encode") {
    assert(s("decodeURLComponent('a%20b%2Bc+d')") == "a b+c+d")
    assert(s("encodeURLComponent('a b+c~d-._')") == "a%20b%2Bc~d-._")
    // round-trip through multi-byte UTF-8
    assert(s("decodeURLComponent(encodeURLComponent('héllo/wörld'))") == "héllo/wörld")
    // malformed escapes pass through
    assert(s("decodeURLComponent('100%')") == "100%")
  }

  test("URL hierarchy: CH cut points") {
    val h = one("URLHierarchy('https://example.com/browse/CONV/eng?url=1')")
      .getSeq[String](0)
    assert(h == Seq("https://example.com/", "https://example.com/browse/",
      "https://example.com/browse/CONV/", "https://example.com/browse/CONV/eng",
      "https://example.com/browse/CONV/eng?url=1"))
    assert(one("URLPathHierarchy('https://h.io/a/b')").getSeq[String](0) ==
      Seq("/a/", "/a/b"))
    assert(one("URLPathHierarchy('https://h.io')").getSeq[String](0).isEmpty)
  }

  test("significant subdomain heuristic") {
    assert(s("firstSignificantSubdomain('http://news.clickhouse.com.tr/x')") ==
      "clickhouse")
    assert(s("cutToFirstSignificantSubdomain('http://news.clickhouse.com.tr/x')") ==
      "clickhouse.com.tr")
    assert(s("firstSignificantSubdomain('http://a.b.example.com/x')") == "example")
    assert(s("cutToFirstSignificantSubdomain('http://a.b.example.com/x')") ==
      "example.com")
    assert(s("firstSignificantSubdomain('http://localhost/x')") == "")
  }

  test("rounding ladders and integer exponentials") {
    assert(l("roundToExp2(1)") == 1L && l("roundToExp2(0)") == 0L)
    assert(l("roundToExp2(1023)") == 512L && l("roundToExp2(1024)") == 1024L)
    assert(l("roundDuration(0)") == 0L && l("roundDuration(35)") == 30L)
    assert(l("roundAge(16)") == 17L && l("roundAge(60)") == 55L)
    assert(d("roundDown(7.5, array(0.0, 5.0, 10.0))") == 5.0)
    assert(d("roundDown(-1.0, array(0.0, 5.0))") == 0.0) // below all -> smallest
    assert(l("intExp10(18)") == 1000000000000000000L)
    intercept[Exception] { one("intExp10(19)") }
    assert(l("intExp2(63)") == Long.MinValue) // wraps like CH Int64
    assert(l("intExp2(64)") == 0L)
  }

  test("bit rotates are true 64-bit rotations") {
    assert(l("bitRotateLeft(1, 64)") == 1L)
    assert(l("bitRotateRight(1, 1)") == Long.MinValue)
    assert(l("bitRotateLeft(bitRotateRight(123456789, 13), 13)") == 123456789L)
    assert(l("bitRotateLeft(-1, 37)") == -1L)
  }

  test("sumKahan survives magnitude cancellation that naive sum drifts on") {
    import spark.implicits._
    // 1e16 + many small values: naive double sum loses them entirely
    val df = (Seq(1e16) ++ Seq.fill(1000)(1.0) ++ Seq(-1e16)).toDF("v")
    df.createOrReplaceTempView("kahan_t")
    val k = d("sumKahan(v) FROM kahan_t")
    assert(k == 1000.0, s"kahan sum got $k")
  }

  test("quantileTDigestWeighted respects weights") {
    import spark.implicits._
    Seq((1.0, 1L), (100.0, 99L)).toDF("v", "w")
      .createOrReplaceTempView("tdw_t")
    val q = d("quantileTDigestWeighted(v, w, 0.5) FROM tdw_t")
    assert(math.abs(q - 100.0) < 1.0, s"weighted median got $q")
  }

  test("quantilesExact returns the percentile array") {
    import spark.implicits._
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("qe_t")
    val arr = one("quantilesExact(v, 0.5, 0.99) FROM qe_t").getSeq[Double](0)
    assert(arr.length == 2 && arr(0) == 50.5 && arr(1) == 99.01)
  }

  test("misc: formatReadable variants, countDigits, throwIf, truncate") {
    assert(s("formatReadableDecimalSize(123456789.0)") == "123.46 MB")
    assert(s("formatReadableTimeDelta(93784.5)") ==
      "1 day, 2 hours, 3 minutes, 4.5 seconds")
    assert(s("formatReadableTimeDelta(0.0)") == "0 seconds")
    assert(s("formatReadableTimeDelta(61.0)") == "1 minute, 1 second")
    assert(one("countDigits(0)").getInt(0) == 1)
    assert(one("countDigits(-12345)").getInt(0) == 5)
    assert(d("truncate(-3.789, 2)") == -3.78)
    intercept[Exception] { one("throwIf(true, 'boom')") }
    assert(!b("throwIf(false, 'boom')"))
    assert(s("toTypeName(array(1))") == "ARRAY<INT>")
  }

  test("SipHash-2-4: reference-paper keyed vectors, then the CH zero key") {
    import org.apache.spark.sql.graft.SipHash
    // vectors from the SipHash reference implementation (key 000102..0f,
    // input bytes 0..n-1)
    val k0 = 0x0706050403020100L
    val k1 = 0x0f0e0d0c0b0a0908L
    val vectors = Map(0 -> 0x726fdb47dd0e0e31L, 1 -> 0x74f839c593dc67fdL,
      2 -> 0x0d6c8009d9a94f5aL, 3 -> 0x85676696d7fb7e2dL,
      8 -> 0x93f5f5799a932462L)
    vectors.foreach { case (n, want) =>
      assert(SipHash.hash64(k0, k1, Array.tabulate[Byte](n)(_.toByte)) == want,
        s"vector n=$n")
    }
    // zero-key SQL surface: stable, distinct, 128 halves differ
    assert(l("sipHash64('abc')") == l("sipHash64('abc')"))
    assert(l("sipHash64('abc')") != l("sipHash64('abd')"))
    assert(one("sipHash128('abc')").getAs[Array[Byte]](0).length == 16)
    val mm = one("ngramMinHash('hello world')").getStruct(0)
    assert(mm.getLong(0) <= mm.getLong(1))
  }

  test("base58: Bitcoin-alphabet vector and round-trips") {
    assert(s("base58Encode('Hello World!')") == "2NEpo7TZRRrLZSi2U") // known vector
    assert(s("base58Decode(base58Encode('graft engine'))") == "graft engine")
    assert(s("base58Encode('')") == "")
    intercept[Exception] { one("base58Decode('0OIl')") } // excluded alphabet chars
  }

  test("morton codes: round-trip and interleave") {
    assert(l("mortonEncode(3, 5)") == 39L) // y=101,x=011 -> 100111
    val r = one("mortonDecode(mortonEncode(123456, 654321))").getStruct(0)
    assert(r.getLong(0) == 123456L && r.getLong(1) == 654321L)
    assert(l("mortonEncode(4294967295, 4294967295)") == -1L) // all 64 bits
    intercept[Exception] { one("mortonEncode(4294967296, 0)") }
  }

  test("bitmask decomposition, reinterpret, JSONType") {
    assert(one("bitmaskToArray(50)").getSeq[Long](0) == Seq(2L, 16L, 32L))
    assert(s("bitmaskToList(50)") == "2,16,32")
    assert(one("bitmaskToArray(0)").getSeq[Long](0).isEmpty)
    assert(l("reinterpretAsUInt32('abcd')") ==
      ('a'.toLong | ('b'.toLong << 8) | ('c'.toLong << 16) | ('d'.toLong << 24)))
    assert(s("JSONType('{}')") == "Object" && s("JSONType('3')") == "Int64" &&
      s("JSONType('3.5')") == "Double" && s("JSONType('oops')") == "")
    assert(s("unbin('0110000101100010')") == "ab")
    assert(s("unbin('110000101100010')") == "ab") // leading 0 bit implied
    intercept[Exception] { one("unbin('012')") }
  }

  test("tuple arithmetic and hamming") {
    val p = one("tuplePlus(struct(1, 2.5), struct(3, 4))").getStruct(0)
    assert(p.getDouble(0) == 4.0 && p.getDouble(1) == 6.5)
    val n = one("tupleNegate(struct(1, -2))").getStruct(0)
    assert(n.getDouble(0) == -1.0 && n.getDouble(1) == 2.0)
    assert(one("tupleHammingDistance(struct(1,2,3), struct(1,9,3))").getInt(0) == 1)
    intercept[Exception] { one("tuplePlus(struct(1), struct(1, 2))") } // arity
  }

  test("wave-2 misc: toTime, toFixedString, decimal ops, normalize, format, arrayReduce") {
    assert(one("toTime(timestamp'2024-03-05 11:22:33')").getTimestamp(0).toString ==
      "1970-01-02 11:22:33.0")
    assert(one("length(toFixedString('ab', 4))").getInt(0) == 4)
    intercept[Exception] { one("toFixedString('abcde', 4)") }
    assert(s("CAST(multiplyDecimal(2.5, 4.2, 2) AS STRING)") == "10.50")
    assert(s("CAST(divideDecimal(10.0, 4.0, 2) AS STRING)") == "2.50")
    assert(s("normalizeQuery(\"SELECT a FROM t WHERE x = 5 AND s = 'abc'\")") ==
      "SELECT a FROM t WHERE x = ? AND s = ?")
    assert(s("format('{} and {}', 'a', 'b')") == "a and b")
    assert(s("format('{1}-{0}', 'x', 'y')") == "y-x")
    intercept[Exception] { one("format('{2}', 'a')") }
    assert(d("arrayReduce('sum', array(1.0, 2.0))") == 3.0)
    assert(l("arrayReduce('uniq', array(1, 1, 2))") == 2L)
    intercept[Exception] { one("arrayReduce('median', array(1))") }
    assert(math.abs(d("greatCircleAngle(0.0, 0.0, 0.0, 90.0)") - 90.0) < 1e-9)
  }

  test("ordered collection aggregates: O(n) heaps, deterministic ties") {
    import spark.implicits._
    Seq((5L, 10L, "e"), (1L, 30L, "a"), (3L, 20L, "c"), (2L, 40L, "b"))
      .toDF("k", "v", "s").createOrReplaceTempView("oc_t")
    assert(one("groupArraySorted(v, 2) FROM oc_t").getSeq[Long](0) == Seq(10L, 20L))
    assert(one("groupArrayLast(k, s, 2) FROM oc_t").getSeq[String](0) == Seq("c", "e"))
    assert(one("groupArrayLast(k, s, 99) FROM oc_t").getSeq[String](0) ==
      Seq("a", "b", "c", "e")) // n > group size: all, ascending key
    // insertAt: explicit positions, default filler, min-wins collision
    Seq((10L, 0), (30L, 2), (20L, 2)).toDF("v", "p").createOrReplaceTempView("ia_t")
    assert(one("groupArrayInsertAt(v, p, 0L, 4) FROM ia_t").getSeq[Long](0) ==
      Seq(10L, 0L, 20L, 0L)) // pos-2 collision -> smallest (20)
    assert(one("groupArrayInsertAt(v, p) FROM ia_t").getSeq[Long](0).length == 3)
  }

  test("quantileBFloat16: within the quantization envelope, order-free") {
    import spark.implicits._
    (1 to 10000).map(_.toDouble / 7.0).toDF("v").createOrReplaceTempView("bf_t")
    val q = d("quantileBFloat16(v, 0.5) FROM bf_t")
    val exact = d("quantileExact(v, 0.5) FROM bf_t")
    assert(math.abs(q - exact) / exact < 0.004, s"bf16 median $q vs exact $exact")
    // repartitioning does not move the result (histogram merge is exact)
    val a = spark.table("bf_t").repartition(1)
      .selectExpr("quantileBFloat16(v, 0.5)").collect()(0).getDouble(0)
    val b = spark.table("bf_t").repartition(7)
      .selectExpr("quantileBFloat16(v, 0.5)").collect()(0).getDouble(0)
    assert(a == b && a == q)
  }

  test("groupArraySample: deterministic across partitionings, seed-sensitive") {
    import spark.implicits._
    (1 to 1000).map(_.toLong).toDF("v").createOrReplaceTempView("gs_t")
    val a = spark.table("gs_t").repartition(1)
      .selectExpr("groupArraySample(v, 10, 7)").collect()(0).getSeq[Long](0)
    val b = spark.table("gs_t").repartition(8)
      .selectExpr("groupArraySample(v, 10, 7)").collect()(0).getSeq[Long](0)
    assert(a == b && a.length == 10 && a.distinct.length == 10)
    val c = spark.table("gs_t")
      .selectExpr("groupArraySample(v, 10, 8)").collect()(0).getSeq[Long](0)
    assert(a != c) // different seed, different sample
  }

  test("histogram agg: bin invariants, merge-order independence") {
    import spark.implicits._
    (1 to 10000).map(_.toDouble).toDF("v").createOrReplaceTempView("hg_t")
    def bins(parts: Int) = spark.table("hg_t").repartition(parts)
      .selectExpr("histogram(v, 8) AS h").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val h1 = bins(1); val h8 = bins(8)
    assert(h1 == h8, "partitioning must not move the histogram")
    assert(h1.length == 8)
    assert(math.round(h1.map(_._3).sum) == 10000L) // heights = row count
    assert(h1.sliding(2).forall(p => p(0)._2 <= p(1)._1 + 1e-9)) // ordered
    assert(h1.head._1 <= 1.0 && h1.last._2 >= 9961.0) // bf16 envelope
  }

  test("arrayFill carries values where the mask is false") {
    assert(one("arrayFill(array(true, false, false, true, false), " +
      "array(1, 2, 3, 4, 5))").getSeq[Int](0) == Seq(1, 1, 1, 4, 4))
    // leading false positions keep their own values until the first true
    assert(one("arrayFill(array(false, false, true), array(7, 8, 9))")
      .getSeq[Int](0) == Seq(7, 7, 9))
  }

  test("extractAllGroupsVertical: one row per match") {
    val r = one("extractAllGroupsVertical('k1=v1, k2=v2', '([a-z0-9]+)=([a-z0-9]+)')")
      .getSeq[scala.collection.Seq[String]](0).map(_.toSeq)
    assert(r == Seq(Seq("k1", "v1"), Seq("k2", "v2")))
    intercept[Exception] { one("extractAllGroupsVertical('x', 'nogroups')") }
  }

  test("JSONExtract typed and quantileDeterministic") {
    assert(s("""JSONExtract('{"a": {"b": "x"}}', 'a', 'b', 'String')""") == "x")
    assert(l("""JSONExtract('{"n": 42}', 'n', 'Int64')""") == 42L)
    assert(d("""JSONExtract('{"n": 4.5}', 'n', 'Float64')""") == 4.5)
    assert(b("""JSONExtract('{"n": true}', 'n', 'Bool')"""))
    intercept[Exception] { one("""JSONExtract('{}', 'a', 'UUID')""") }
    import spark.implicits._
    (1 to 100).map(i => (i.toDouble, i * 7L)).toDF("v", "det")
      .createOrReplaceTempView("qd_t")
    assert(d("quantileDeterministic(v, det, 0.5) FROM qd_t") == 50.5)
  }

  test("multiSearchFirst* tie and miss semantics") {
    assert(one("multiSearchFirstPosition('hello', array('xx', 'yy'))").getInt(0) == 0)
    assert(one("multiSearchFirstPosition('hello', array('llo', 'ell'))").getInt(0) == 2)
    assert(one("multiSearchFirstIndex('hello', array('llo', 'ell'))").getInt(0) == 1)
    assert(one("multiSearchFirstIndex('hello', array('zz'))").getInt(0) == 0)
  }

  test("collection edges: resize/rotate/enumerate on empty and wrap") {
    assert(one("arrayRotateLeft(array(1,2,3), 0)").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("arrayRotateLeft(array(1,2,3), 3)").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("arrayRotateLeft(array(1,2,3), -1)").getSeq[Int](0) == Seq(3, 1, 2))
    assert(one("arrayEnumerateUniq(array('a','a','b','a'))").getSeq[Int](0) ==
      Seq(1, 2, 1, 3))
    assert(b("hasSubstr(array(1,2,3), array())"))
    assert(!b("hasSubstr(array(1,2,3), array(2,4))"))
    assert(!b("hasSubstr(array(1,3), array(1,3,5))"))
  }
}
