package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.HashEmbedder
import org.apache.spark.sql.graft.{F16, PackedOps}
import org.apache.spark.sql.graft.PackedVectorFunctions._
import org.apache.spark.sql.graft.VectorFunctions._

/** Packed vector storage (fp32 + fp16) — the reference's `fp16_storage=1`
  * layout (`myscale_tables.py:35,63`) re-expressed on Spark binary columns.
  */
class PackedVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F16: exact round-trip for exactly-representable halves") {
    for (f <- Seq(0.0f, -0.0f, 0.5f, 1.0f, -2.0f, 0.25f, 1024.0f, -0.09375f)) {
      assert(F16.halfToFloat(F16.floatToHalf(f) & 0xffff) === f)
    }
  }

  test("F16: every 16-bit pattern decodes and re-encodes to itself") {
    // encode(decode(h)) == h for all finite halves (canonical NaN excepted)
    var h = 0
    var checked = 0
    while (h < 65536) {
      val f = F16.halfToFloat(h)
      if (!f.isNaN) {
        assert((F16.floatToHalf(f) & 0xffff) === h,
          s"pattern $h decoded to $f re-encoded to ${F16.floatToHalf(f) & 0xffff}")
        checked += 1
      }
      h += 1
    }
    assert(checked > 63000) // all but the NaN space
  }

  test("F16: quantization error bound on [-1, 1] random floats") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10000) {
      val f = (rnd.nextFloat() * 2 - 1)
      val g = F16.halfToFloat(F16.floatToHalf(f) & 0xffff)
      assert(math.abs(f - g) <= math.max(math.abs(f) * 0.000489, 6e-8),
        s"$f -> $g")
    }
  }

  test("fp32 pack/unpack is a lossless round-trip (bit-exact)") {
    val v = HashEmbedder.embed("round trip probe")
    assert(PackedOps.unpack(PackedOps.pack(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))).sameElements(v))
    val df = Seq(Tuple1(v.toSeq)).toDF("v")
    val back = df.select(vec_unpack(vec_pack($"v")).as("v")).as[Seq[Float]].head()
    assert(back == v.toSeq)
  }

  test("cosine_distance_packed == cosine_distance bit-for-bit on data vectors") {
    val q = HashEmbedder.embed("packed parity probe")
    val e = Tables.embeddings(spark, TestSpark.sf)
    val arr = e.select($"vec_id",
      cosine_distance($"embedding", typedlit(q.toIndexedSeq)).as("d"))
    val packed = e.select($"vec_id",
      cosine_distance_packed(vec_pack($"embedding"), typedlit(q.toIndexedSeq)).as("d"))
    val joined = arr.as("a").join(packed.as("p"), "vec_id")
      .select($"a.d".as("da"), $"p.d".as("dp"))
      .filter($"da" =!= $"dp")
    assert(joined.count() === 0)
  }

  test("f16 scan: top-10 recall vs exact on test embeddings >= 0.9") {
    val q = HashEmbedder.embed("f16 recall probe")
    val e = Tables.embeddings(spark, TestSpark.sf)
    val exact = e.select($"vec_id",
        cosine_distance($"embedding", typedlit(q.toIndexedSeq)).as("d"))
      .orderBy($"d", $"vec_id").limit(10).select("vec_id").as[Long].collect().toSet
    val f16 = e.select($"vec_id",
        cosine_distance_f16(vec_pack_f16($"embedding"), typedlit(q.toIndexedSeq)).as("d"))
      .orderBy($"d", $"vec_id").limit(10).select("vec_id").as[Long].collect().toSet
    assert(exact.intersect(f16).size >= 9)
  }

  test("packed distance: non-literal query column falls back correctly") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(4.0f, 5.0f, 6.0f)
    val expected = 1.0 - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    val df = Seq((a.toSeq, b.toSeq)).toDF("x", "y")
    val got = df.select(
      cosine_distance_packed(vec_pack($"x"), $"y").as("d")).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("lsh_signature: scale-invariant, codegen == interpreted, bit semantics") {
    import org.apache.spark.sql.graft.LshSignature
    val e = Tables.embeddings(spark, TestSpark.sf).limit(100)
    // positive scaling preserves every sign bit (the q96 planted-copy
    // guarantee)
    val sigs = e.select(
      LshSignature.lsh_signature($"embedding", 64).as("s1"),
      LshSignature.lsh_signature(
        transform($"embedding", x => (x * lit(2.0f)).cast("float")), 64).as("s2"))
    assert(sigs.filter($"s1" =!= $"s2").count() === 0)
    // interpreted path (expression eval outside codegen) agrees
    val v = HashEmbedder.embed("lsh parity probe")
    val viaDf = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(LshSignature.lsh_signature($"v", 64)).as[Long].head()
    val expr = org.apache.spark.sql.graft.LshSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      LshSignature.planes(64), 64)
    assert(expr.eval(null).asInstanceOf[Long] === viaDf)
  }

  test("cdc_chunks: lengths partition the doc; boundaries are insert-stable") {
    import org.apache.spark.sql.graft.CdcChunks
    val docs = Tables.documents(spark, TestSpark.sf).limit(50)
    // chunk lengths sum back to the byte length for every doc
    val bad = docs.select(octet_length($"text").cast("long").as("len"),
        aggregate(CdcChunks.cdc_chunks($"text"), lit(0L), (a, x) => a + x).as("sum"))
      .filter($"len" =!= $"sum").count()
    assert(bad === 0)
    // content-defined stability: an edit near the END leaves the chunk
    // sequence before the edit untouched (fixed-size chunking would not)
    val text = Tables.documents(spark, TestSpark.sf)
      .orderBy($"n_chars".desc).select("text").as[String].head()
    val orig = CdcChunks.split(text.getBytes, 16, 0x3f)
    val edited = CdcChunks.split((text + " trailing edit").getBytes, 16, 0x3f)
    assert(orig.length > 2, s"want multiple chunks, got ${orig.toSeq}")
    assert(edited.take(orig.length - 1).toSeq == orig.take(orig.length - 1).toSeq)
    // a PREFIX edit shifts content, yet the cut positions resynchronize:
    // the tail chunk lengths eventually realign with the original
    val prefixEdited = CdcChunks.split(("prefix " + text).getBytes, 16, 0x3f)
    assert(prefixEdited.takeRight(2).toSeq == orig.takeRight(2).toSeq)
  }

  test("SQL surface: vec_pack / cosine_distance_packed registered") {
    Tables.embeddings(spark, TestSpark.sf).createOrReplaceTempView("emb_pv")
    val viaSql = spark.sql(s"""
      SELECT vec_id, cosine_distance_packed(vec_pack(embedding), NeuralArray('sql packed probe')) AS d
      FROM emb_pv ORDER BY d, vec_id LIMIT 5""").as[(Long, Double)].collect()
    val viaCol = Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", cosine_distance($"embedding",
        typedlit(HashEmbedder.embed("sql packed probe").toIndexedSeq)).as("d"))
      .orderBy($"d", $"vec_id").limit(5).as[(Long, Double)].collect()
    assert(viaSql.map(_._1).sameElements(viaCol.map(_._1)))
  }
}
