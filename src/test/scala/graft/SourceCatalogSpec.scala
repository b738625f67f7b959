package graft

import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Catalog, Ingest}
import graft.sources.JsonEachRow

class SourceCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeJsonlFixtures(): String = {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val rows = (0 until 50).map(i =>
      s"""{"id": $i, "title": "t$i", "vec": [${0.5 * i}, 1.5], "meta": "{\\"views\\": ${i * 10}}"}""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/part1.jsonl"),
      rows.take(25).mkString("\n"))
    val gz = new GZIPOutputStream(
      Files.newOutputStream(java.nio.file.Paths.get(s"$dir/part2.jsonl.gz")))
    gz.write(rows.drop(25).mkString("\n").getBytes)
    gz.close()
    dir
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("vec", ArrayType(FloatType)),
    StructField("meta", StringType)))

  test("JsonEachRow: schema'd read over mixed plain+gz partitioned glob") {
    val dir = writeJsonlFixtures()
    val df = JsonEachRow.read(spark, schema, s"$dir/part*.jsonl*")
    assert(df.count() == 50)
    assert(df.schema == schema)
    // JSON metadata column stays queryable (Object('JSON') mapping)
    val views = df.filter(col("id") === 7)
      .select(get_json_object(col("meta"), "$.views").cast("long")).as[Long].head()
    assert(views == 70)
  }

  test("vector dim check: passes at the right dim, rejects wrong dim") {
    val dir = writeJsonlFixtures()
    val df = JsonEachRow.read(spark, schema, s"$dir/part*.jsonl*")
    JsonEachRow.requireVectorDim(df, "vec", 2)
    intercept[IllegalArgumentException] {
      JsonEachRow.requireVectorDim(df, "vec", 768)
    }
  }

  test("Catalog: upsert compaction + delete + compact roundtrip") {
    val root = Files.createTempDirectory("graft-cat").toString
    val cat = Catalog(spark, root)
    val v1 = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("id", "v", "version")
    cat.create("t", v1)
    cat.append("t", Seq((2L, "b2", 2)).toDF("id", "v", "version"))
    val upserted = cat.read("t", Seq("id"), "version")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(upserted == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    cat.deleteWhere("t", col("id") === 3)
    assert(cat.read("t", Seq("id"), "version").count() == 2)
    cat.compact("t", Seq("id"), "version")
    // post-compact raw history contains exactly the live rows
    assert(cat.readRaw("t").count() == 2)
    assert(cat.read("t", Seq("id"), "version")
      .select("v").as[String].collect().sorted.toSeq == Seq("a", "b2"))
  }

  test("RewriteMustHaveColumns appends missing projection columns (injected)") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base) // genuinely a new session with the extensions
      Tables.documents(s2, TestSpark.sf).createOrReplaceTempView("kbdocs")
      s2.conf.set("spark.graft.mustHave.kbdocs", "doc_id,lang")
      val out = s2.sql("SELECT text FROM kbdocs")
      assert(out.columns.toSeq == Seq("text", "doc_id", "lang"))
      assert(out.count() > 0)
      // already-present must-haves are not duplicated
      val out2 = s2.sql("SELECT doc_id, text FROM kbdocs")
      assert(out2.columns.toSeq == Seq("doc_id", "text", "lang"))
      // without the conf, no rewrite
      s2.conf.unset("spark.graft.mustHave.kbdocs")
      assert(s2.sql("SELECT text FROM kbdocs").columns.toSeq == Seq("text"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("Catalog: partitioned create prunes per-key reads") {
    val root = Files.createTempDirectory("graft-cat-part").toString
    val cat = Catalog(spark, root)
    val df = Seq((1L, "s1", "a"), (2L, "s1", "b"), (3L, "s2", "c"))
      .toDF("id", "session_id", "v")
    cat.create("m", df, partitionBy = Seq("session_id"))
    // physical layout: one directory per session (the chat-memory
    // PARTITION BY session_id analog); per-key read prunes partitions
    assert(new java.io.File(s"$root/m/session_id=s1").exists())
    val one = cat.readRaw("m").filter(col("session_id") === "s1")
    assert(one.count() == 2)
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("Catalog: mutations rewrite ONLY the affected partitions") {
    val root = Files.createTempDirectory("graft-cat-mut").toString
    val cat = Catalog(spark, root)
    val df = (1L to 90L).map(i => (i, s"d${i % 3}", i * 10.0))
      .toDF("id", "day", "v")
    cat.create("t", df, partitionBy = Seq("day"))
    def files(day: String): Map[String, Long] = {
      val d = java.nio.file.Paths.get(root, "t", s"day=$day")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    }
    val d1Before = files("d1")
    val d2Before = files("d2")
    // delete rows in d0 only: d1/d2 files must be BYTE-UNTOUCHED
    cat.deleteWhere("t", col("day") === "d0" && col("id") <= 30L)
    assert(files("d1") == d1Before && files("d2") == d2Before)
    assert(cat.readRaw("t").count() == 80) // 10 of 30 d0 rows matched...
    // (ids 3,6,...,30 in d0: exactly the 10 multiples of 3 <= 30)
    // update rows in d1 only: again no touch elsewhere
    val d2Mid = files("d2")
    cat.updateWhere("t", col("day") === "d1", Map("v" -> lit(-1.0)))
    assert(files("d2") == d2Mid)
    assert(cat.readRaw("t").filter(col("v") === -1.0).count() == 30)
    // a full-partition delete removes the directory outright
    cat.deleteWhere("t", col("day") === "d2")
    assert(!new java.io.File(s"$root/t/day=d2").exists())
    assert(cat.readRaw("t").count() == 50)
    // no-match mutation rewrites ZERO bytes
    val d1Mid = files("d1")
    cat.deleteWhere("t", col("day") === "nope")
    assert(files("d1") == d1Mid)
    // predicates off the partition key still work (all partitions match)
    cat.deleteWhere("t", col("id") % 10L === 0L)
    assert(cat.readRaw("t").count() == 45)
  }

  test("Catalog: NESTED-layout mutations rewrite only matched leaf dirs") {
    val root = Files.createTempDirectory("graft-cat-mut2").toString
    val cat = Catalog(spark, root)
    // day=/lang= — the two-axis retention layout (r11 verdict item 2)
    val df = (1L to 180L).map(i => (i, s"d${i % 3}", s"l${(i / 3) % 3}", i * 10.0))
      .toDF("id", "day", "lang", "v")
    cat.create("t", df, partitionBy = Seq("day", "lang"))
    def leaf(day: String, lang: String): Map[String, Long] = {
      val d = java.nio.file.Paths.get(root, "t", s"day=$day", s"lang=$lang")
      import scala.jdk.CollectionConverters._
      if (!java.nio.file.Files.isDirectory(d)) Map.empty
      else java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    }
    val others = for (d <- 0 to 2; l <- 0 to 2; if (d, l) != ((1, 1)))
      yield (d, l) -> leaf(s"d$d", s"l$l")
    assert(others.forall(_._2.nonEmpty))
    // partial delete inside one leaf: every OTHER leaf byte-untouched
    cat.deleteWhere("t", col("day") === "d1" && col("lang") === "l1" &&
      col("id") % 2 === 0)
    assert(others.forall { case ((d, l), snap) => leaf(s"d$d", s"l$l") == snap })
    assert(cat.readRaw("t").count() == 180 - 10)
    // whole-leaf delete removes the leaf dir, keeps its day= siblings
    cat.deleteWhere("t", col("day") === "d2" && col("lang") === "l2")
    assert(!new java.io.File(s"$root/t/day=d2/lang=l2").exists())
    assert(new java.io.File(s"$root/t/day=d2/lang=l0").exists())
    // whole-DAY delete (all three leaves) removes the emptied ancestor
    // too — a hollow day= dir would break later layout detection
    cat.deleteWhere("t", col("day") === "d0")
    assert(!new java.io.File(s"$root/t/day=d0").exists())
    // UPDATE on one leaf: day=d2 survivors byte-untouched
    val d2l0 = leaf("d2", "l0")
    cat.updateWhere("t", col("day") === "d1" && col("lang") === "l2",
      Map("v" -> lit(-1.0)))
    assert(leaf("d2", "l0") == d2l0)
    assert(cat.readRaw("t").filter(col("v") === -1.0).count() == 20)
    // net state stays exact vs recomputing from scratch
    val expect = df
      .filter(!(col("day") === "d1" && col("lang") === "l1" && col("id") % 2 === 0))
      .filter(!(col("day") === "d2" && col("lang") === "l2"))
      .filter(col("day") =!= "d0")
      .withColumn("v", when(col("day") === "d1" && col("lang") === "l2", -1.0)
        .otherwise(col("v")))
      .select("id", "v").orderBy("id").collect().toSeq
    assert(cat.readRaw("t").select("id", "v").orderBy("id").collect().toSeq
      == expect)
  }

  test("JsonEachRow PERMISSIVE mode: malformed lines become null rows, not failures") {
    val dir = Files.createTempDirectory("graft-badjson").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/bad.jsonl"),
      """{"id": 1, "title": "ok", "vec": [1.0], "meta": "{}"}
        |{not json at all
        |{"id": 3, "title": "ok3", "vec": [2.0], "meta": "{}"}""".stripMargin)
    val df = JsonEachRow.read(spark, schema, s"$dir/*.jsonl")
    assert(df.count() == 3) // bad row kept as nulls
    assert(df.filter(col("id").isNull).count() == 1)
    assert(df.filter(col("id").isNotNull).count() == 2)
  }

  test("arrayElement is 1-based like ClickHouse") {
    val r = spark.sql("SELECT arrayElement(array('a','b','c'), 1) AS x").head().getString(0)
    assert(r == "a")
  }

  test("arrayFilter dialect function filters with a lambda") {
    val got = spark.sql(
      "SELECT arrayFilter(x -> x > 2, array(1, 2, 3, 4)) AS r").head().getSeq[Int](0)
    assert(got == Seq(3, 4))
  }

  test("Ingest: chunk sizes, strict >10-word filter, embed dim") {
    val docs = Seq((1L, "src", (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val chunks = Ingest.chunk(docs, "doc_id", "source", "text")
    // 40 tokens -> chunks of 15/15/10
    assert(chunks.count() == 3)
    val kept = Ingest.narrativeFilter(chunks)
    assert(kept.count() == 2) // the 10-word tail is dropped (strict >10)
    val embedded = Ingest.embed(kept, "chunk_text")
    val vecs = embedded.select("vector").as[Seq[Float]].collect()
    assert(vecs.forall(_.length == graft.functions.HashEmbedder.DefaultDim))
  }
}
