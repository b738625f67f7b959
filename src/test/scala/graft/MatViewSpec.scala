package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ProjectionCatalog.Measure
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MatView

/** Gates for the AggregatingMergeTree materialized view
  * ([[graft.operators.MatView]]):
  *
  *   1. Incremental inserts over ANY split of the rows finalize to the
  *      one-shot aggregate (exact for longs + decimal-cast sums).
  *   2. compact() bounds the partial log at one row/key and never
  *      changes the finalized read.
  *   3. New keys arriving only in later batches appear; keys never
  *      inserted don't.
  *   4. Streaming population: foreachBatch(mv.insert) over a
  *      MemoryStream equals the batch aggregate of everything sent.
  */
class MatViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"mv_$tag").toString + "/mv.parquet"

  private def rows(n: Int, keyMod: Int, off: Int = 0) =
    spark.range(off, off + n).select(
      concat(lit("k"), (col("id") % keyMod).cast("string")).as("k"),
      (col("id") % 1000).as("v"),
      ((col("id") % 777).cast("double") / 4.0).as("d"))

  private val measures = Seq(Measure("v"), Measure("d", Some(DecimalType(18, 2))))

  test("incremental inserts finalize to the one-shot aggregate") {
    val all = rows(5000, 7).cache()
    val mv = MatView.create(spark, freshPath("inc"), Seq("k"), measures,
      initial = all.filter($"v" % 3 === 0))
    mv.insert(all.filter($"v" % 3 === 1))
    mv.insert(all.filter($"v" % 3 === 2))
    val got = mv.read()
      .select($"k", $"sum_v", $"min_v", $"max_v", $"cnt_v",
        $"sum_d".cast("double").as("sd"), $"cnt")
      .orderBy("k").collect().map(_.toSeq)
    val want = all.groupBy("k").agg(
      sum($"v").as("sum_v"), min($"v").as("min_v"), max($"v").as("max_v"),
      count($"v").as("cnt_v"),
      sum($"d".cast(DecimalType(18, 2))).cast(DecimalType(28, 2))
        .cast("double").as("sd"),
      count(lit(1)).as("cnt"))
      .orderBy("k").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    all.unpersist()
  }

  test("compact bounds the log at one row per key and preserves reads") {
    val all = rows(2000, 5).cache()
    val mv = MatView.create(spark, freshPath("cpt"), Seq("k"), measures,
      initial = all.limit(0))
    (0 until 8).foreach(i => mv.insert(all.filter($"v" % 8 === i)))
    val before = mv.read().orderBy("k").collect().map(_.toSeq).toSeq
    assert(mv.partialCount() > 5) // an actual multi-part log
    mv.compact()
    assert(mv.partialCount() == 5) // exactly one row per key
    val after = mv.read().orderBy("k").collect().map(_.toSeq).toSeq
    assert(before == after)
    all.unpersist()
  }

  test("late-arriving keys appear; absent keys don't") {
    val mv = MatView.create(spark, freshPath("late"), Seq("k"), measures,
      initial = rows(100, 2)) // keys k0, k1
    mv.insert(rows(90, 3).filter($"k" === "k2")) // k2 arrives later
    val ks = mv.read().select("k").collect().map(_.getString(0)).toSet
    assert(ks == Set("k0", "k1", "k2"))
  }

  test("streaming foreachBatch population equals the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val mv = MatView(spark, freshPath("str"), Seq("k"), measures)
    var lastBatch: org.apache.spark.sql.DataFrame = null
    var lastId = -1L
    val q = ms.toDS().toDF("k", "v", "d")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        mv.insertBatch(b, id)
        lastBatch = b.sparkSession.createDataFrame(
          b.collect().toIndexedSeq.asJava, b.schema)
        lastId = id
      }.start()
    try {
      ms.addData(("a", 1L, 0.25), ("a", 2L, 0.5), ("b", 10L, 1.0))
      q.processAllAvailable()
      ms.addData(("b", 20L, 2.0), ("c", 5L, 0.75))
      q.processAllAvailable()
      ms.addData(("a", 3L, 1.25))
      q.processAllAvailable()
      def state() = mv.read().select($"k", $"sum_v", $"cnt",
        $"sum_d".cast("double").as("sd"))
        .orderBy("k").collect().map(_.toSeq).toSeq
      val want = Seq(
        Seq("a", 6L, 3L, 2.0),
        Seq("b", 30L, 2L, 3.0),
        Seq("c", 5L, 1L, 0.75))
      assert(state() == want)
      // foreachBatch REPLAY (its at-least-once delivery): re-running
      // the last batch with its own id must NOT double count — the
      // dynamic overwrite rewrites __bid=N to the same contents (the
      // plain append insert() would have doubled key "a" here)
      mv.insertBatch(lastBatch, lastId)
      assert(state() == want)
      // OPTIMIZE FINAL between batches keeps the answers
      mv.compact()
      assert(state() == want)
      // ... and the pre-flip root-level __bid=* partition dirs (this
      // view was populated through the bare constructor, so its
      // partial log lived at the root) are dropped with the flip —
      // they were leaking forever before (r16 ADVICE), the exact
      // __v=* shape MvccCatalog.dropLegacyData handles
      val fsOps = graft.operators.FsOps(spark)
      assert(!fsOps.listChildren(mv.path).exists {
        case (n, d) => d && n.startsWith("__bid=")
      })
      assert(state() == want)
    } finally q.stop()
  }
}
