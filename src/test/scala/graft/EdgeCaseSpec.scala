package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin, SelfQueryFilter => F}

class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("AsOfJoin: left rows before any right row get null matches") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), "early"),
      (1L, ts("2024-01-01 12:00:00"), "late")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 06:00:00"), 42L)).toDF("k", "ts", "rid")
    val out = AsOfJoin.join(left, right, "k", "ts", Seq("rid"))
      .orderBy("ts").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("matched_rid"))) // early: no match
    assert(out(1).getAs[Long]("matched_rid") == 42L)          // late: matched
  }

  test("AsOfJoin: equal timestamps match inclusively (right <= left)") {
    val t = ts("2024-01-01 06:00:00")
    val left = Seq((1L, t, "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, t, 7L)).toDF("k", "ts", "rid")
    val out = AsOfJoin.join(left, right, "k", "ts", Seq("rid")).collect()
    assert(out.head.getAs[Long]("matched_rid") == 7L)
  }

  test("AsOfJoin: keys with no right rows at all still emit left rows") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "a"),
      (2L, ts("2024-01-01 00:00:00"), "b")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2023-12-31 00:00:00"), 9L)).toDF("k", "ts", "rid")
    val out = AsOfJoin.join(left, right, "k", "ts", Seq("rid"))
    assert(out.count() == 2)
    assert(out.filter(col("k") === 2).collect().head
      .isNullAt(out.schema.fieldIndex("matched_rid")))
  }

  test("RangeJoin: boundary pairs exactly at the window are included") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:05:00")),  // exactly 300s from #1
      (3L, ts("2024-01-01 00:10:01"))). // 301s from #2
      toDF("event_id", "ts")
    val pairs = RangeJoin.selfWithin(df, "event_id", "ts", 300L)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // inclusive boundary; (2,3) excluded
  }

  test("RangeJoin: cross-band pairs found in both time directions") {
    // two rows 10s apart straddling a 300s band boundary, higher id earlier
    val df = Seq(
      (9L, ts("2024-01-01 00:04:55")),
      (2L, ts("2024-01-01 00:05:05"))).toDF("event_id", "ts")
    val pairs = RangeJoin.selfWithin(df, "event_id", "ts", 300L)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 9L)))
  }

  test("SelfQueryFilter: toSql and compile agree on the documents table") {
    val ast = F.Or.of(
      F.And.of(F.Eq("lang", F.S("en")), F.Gt("n_chars", F.I(250))),
      F.And.of(F.Like("text", "%stream%"), F.Not(F.Eq("lang", F.S("de")))))
    val docs = Tables.documents(spark, TestSpark.sf)
    docs.createOrReplaceTempView("sq_docs")
    val viaCompile = docs.filter(F.compile(ast))
      .select("doc_id").as[Long].collect().toSet
    // toSql fragment is ANSI; run it through Spark SQL as a cross-check
    val viaSql = spark.sql(
        s"SELECT doc_id FROM sq_docs WHERE ${F.toSql(ast).replace("list_contains", "array_contains")}")
      .as[Long].collect().toSet
    assert(viaCompile == viaSql && viaCompile.nonEmpty)
  }

  // ---- round-2 expression edge cases ----------------------------------

  test("packed vectors: empty array, null, and odd-length binary") {
    import org.apache.spark.sql.graft.PackedVectorFunctions._
    val df = Seq(Tuple1(Seq.empty[Float])).toDF("v")
    // empty vector -> empty binary -> empty round-trip
    val rt = df.select(vec_unpack(vec_pack($"v")).as("v")).as[Seq[Float]].head()
    assert(rt.isEmpty)
    // null propagates (nullIntolerant)
    val withNull = Seq((1, None: Option[Seq[Float]])).toDF("id", "v")
    assert(withNull.select(vec_pack($"v")).filter($"vec_pack(v)".isNotNull).count() === 0)
    // truncated binary: distance uses min(len/4, qlen) -- no crash
    val q = Seq(1.0f, 2.0f, 3.0f)
    val trunc = Seq(Tuple1(Array[Byte](0, 0, -128, 63))).toDF("b") // 1 float = 1.0f
    val d = trunc.select(cosine_distance_packed($"b", typedlit(q)).as("d")).as[Double].head()
    assert(!d.isNaN)
  }

  test("f16: zero vector and subnormal flush") {
    import org.apache.spark.sql.graft.F16
    assert(F16.halfToFloat(F16.floatToHalf(0.0f) & 0xffff) === 0.0f)
    // below half subnormal range flushes to signed zero
    assert(math.abs(F16.halfToFloat(F16.floatToHalf(1e-9f) & 0xffff)) === 0.0f)
    // largest normal half round-trips
    assert(F16.halfToFloat(F16.floatToHalf(65504.0f) & 0xffff) === 65504.0f)
  }

  test("cdc_chunks: empty and sub-window strings") {
    import org.apache.spark.sql.graft.CdcChunks
    assert(CdcChunks.split(Array.emptyByteArray, 16, 0x3f).toSeq == Seq(0L))
    assert(CdcChunks.split("short".getBytes, 16, 0x3f).toSeq == Seq(5L))
    val viaDf = Seq(Tuple1("")).toDF("t")
      .select(CdcChunks.cdc_chunks($"t")).as[Seq[Long]].head()
    assert(viaDf == Seq(0L))
  }

  test("PqEncode: dimension mismatch truncates safely, never crashes") {
    import graft.operators.PqIndex
    val e = Tables.embeddings(spark, TestSpark.sf)
    val model = PqIndex.fitCached(e, TestSpark.sf, "embedding", "vec_id")
    // a shorter vector than dsub*m: encode reads what exists
    val short = Seq(Tuple1(Seq.fill(8)(0.1f))).toDF("v")
    val code = short.select(PqIndex.encode(model, $"v")).as[Array[Byte]].head()
    assert(code.length === 8)
  }

  test("lsh_signature: empty vector yields a signature without crashing") {
    import org.apache.spark.sql.graft.LshSignature
    val df = Seq(Tuple1(Seq.empty[Float])).toDF("v")
    val sig = df.select(LshSignature.lsh_signature($"v", 64)).as[Long].head()
    assert(sig === 0L) // all dots are 0 -> no bit set
  }

  test("SelfQueryParser: deeply nested and unicode-ish content") {
    import graft.operators.{SelfQueryParser => P}
    val ast = P.parseFilter(
      """and(and(and(eq("a", 1), eq("b", 2)), or(eq("c", 3), eq("d", 4))), not(eq("e", "naïve")))""")
    assert(F.toSql(ast).contains("naïve"))
  }

  test("filtered serving: zero-survivor predicate returns empty, never crashes") {
    import graft.functions.HashEmbedder
    import graft.operators.{GraphAnn, PackedScan, SelfQueryFilter => F}
    val e = Tables.embeddings(spark, TestSpark.sf)
    val d = Tables.documents(spark, TestSpark.sf)
    val corpus = e.join(d, e("vec_id") === d("doc_id"))
      .select(e("vec_id"), e("embedding"), d("lang"))
    val nobody: F.Node = F.Eq("lang", F.S("tlh")) // no Klingon docs
    val q = HashEmbedder.embed("edge probe")
    val scan = PackedScan.buildCached(corpus, "edge0#" + TestSpark.sf,
      "vec_id", "embedding", Seq("lang"))
    assert(scan.topK(q, 10, Some(nobody)).isEmpty)
    val g = GraphAnn.buildCached(corpus, "edge0#" + TestSpark.sf,
      "vec_id", "embedding", metaCols = Seq("lang"))
    val (res, _) = g.topK(q, 10, ef = 64, Some(nobody))
    assert(res.isEmpty)
    // unknown column fails loudly at bind time, not silently empty
    intercept[Exception] {
      g.topK(q, 10, ef = 64, Some(F.Eq("no_such_col", F.S("x"))))
    }
  }

  test("serving paths: k <= 0 returns empty per query, never crashes") {
    import graft.functions.HashEmbedder
    import graft.operators.{Bm25Index, PackedScan}
    val e = Tables.embeddings(spark, TestSpark.sf)
    val scan = PackedScan.buildCached(e, "edge#" + TestSpark.sf, "vec_id", "embedding")
    val q = HashEmbedder.embed("edge probe")
    assert(scan.topK(q, 0).isEmpty)
    assert(scan.topKBatch(Array(q, q), -3).forall(_.isEmpty))
    val ix = Bm25Index.buildCached(Tables.documents(spark, TestSpark.sf),
      "edge#" + TestSpark.sf, "doc_id", "text")
    assert(ix.topK(Seq("query"), 0).isEmpty)
    assert(ix.topKBatch(Seq(Seq("query"), Seq("data")), -1).forall(_.isEmpty))
    val g = graft.operators.GraphAnn.buildCached(e, "edge#" + TestSpark.sf,
      "vec_id", "embedding")
    val (res, visited) = g.topKBatch(Array(q), 0, ef = 16)
    assert(res.forall(_.isEmpty) && visited == 0L)
  }
}
