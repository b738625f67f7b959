package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ProjectionCatalog
import org.apache.spark.sql.graft.ProjectionCatalog.Measure
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MatView

/** Property armor for the shared partial-state algebra behind
  * projections (q168) and the matview (q169): over SEEDED random
  * datasets, random batch splits, random compaction points and random
  * key subsets, the incrementally-maintained / rewritten result must
  * equal the one-shot aggregate exactly. Complements the example-based
  * ProjectionSpec/MatViewSpec the way FunnelPropertySpec armors the
  * funnel kernels.
  */
class RollupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val measures = Seq(Measure("v"), Measure("d", Some(DecimalType(18, 2))))

  private def randomDf(seed: Int, n: Int) = {
    val r = new Random(seed)
    val kCard = 1 + r.nextInt(8)
    val rows = (0 until n).map { _ =>
      (s"k${r.nextInt(kCard)}", r.nextInt(5).toLong,
        r.nextInt(1000).toLong - 500L,
        // 2-decimal double, positive and negative
        (r.nextInt(200000) - 100000) / 100.0)
    }
    import spark.implicits._
    spark.createDataset(rows).toDF("k1", "k2", "v", "d").repartition(5)
  }

  test("matview: random splits + compaction points == one-shot aggregate") {
    (1 to 5).foreach { seed =>
      val r = new Random(seed * 7919)
      val df = randomDf(seed, 2000 + r.nextInt(3000)).cache()
      val nBatches = 1 + r.nextInt(5)
      val withB = df.withColumn("__b",
        pmod(xxhash64(col("v"), col("d"), lit(seed)), lit(nBatches)))
      val path = Files.createTempDirectory(s"mv_prop_$seed").toString + "/mv"
      val mv = MatView.create(spark, path, Seq("k1", "k2"), measures,
        initial = withB.filter(col("__b") === 0).drop("__b"))
      (1 until nBatches).foreach { b =>
        mv.insert(withB.filter(col("__b") === b).drop("__b"))
        if (r.nextBoolean()) mv.compact()
      }
      val got = mv.read().orderBy("k1", "k2").collect().map(_.toSeq).toSeq
      val want = df.groupBy("k1", "k2").agg(
        sum(col("v")).as("sum_v"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"), count(col("v")).as("cnt_v"),
        sum(col("d").cast(DecimalType(18, 2))).cast(DecimalType(28, 2))
          .as("sum_d"),
        min(col("d")).as("min_d"), max(col("d")).as("max_d"),
        count(col("d")).as("cnt_d"), count(lit(1)).as("cnt"))
        .select("k1", "k2", "sum_v", "min_v", "max_v", "cnt_v",
          "sum_d", "min_d", "max_d", "cnt_d", "cnt")
        .orderBy("k1", "k2").collect().map(_.toSeq).toSeq
      assert(got == want, s"seed=$seed nBatches=$nBatches")
      df.unpersist()
    }
  }

  test("projection rewrite: random key subsets == rule-off plan") {
    (1 to 5).foreach { seed =>
      val r = new Random(seed * 104729)
      val df = randomDf(seed + 100, 3000)
      val dir = Files.createTempDirectory(s"proj_prop_$seed").toString
      val basePath = s"$dir/base.parquet"
      df.write.mode("overwrite").parquet(basePath)
      ProjectionCatalog.define(spark, s"prop_$seed", basePath,
        s"$dir/proj.parquet", keys = Seq("k1", "k2"), measures = measures)
      val groupKeys = Seq(Seq("k1", "k2"), Seq("k1"), Seq("k2"))(r.nextInt(3))
      val withFilter = r.nextBoolean()
      def q = {
        val base0 = spark.read.parquet(basePath)
        val base = if (withFilter) base0.filter(col("k2") =!= 2) else base0
        base.groupBy(groupKeys.map(col): _*).agg(
          sum(col("v")).as("sv"), count(lit(1)).as("n"),
          min(col("v")).as("mn"), max(col("v")).as("mx"),
          avg(col("v")).as("av"),
          sum(col("d").cast(DecimalType(18, 2))).cast("double").as("sd"))
          .orderBy(groupKeys.map(col): _*)
      }
      val served = q
      assert(ProjectionCatalog.servedByProjection(served),
        s"seed=$seed keys=$groupKeys filter=$withFilter should fire")
      val got = served.collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.projections.enabled", "false")
      val want = try q.collect().map(_.toSeq).toSeq
        finally spark.conf.set("spark.graft.projections.enabled", "true")
      assert(got == want, s"seed=$seed keys=$groupKeys filter=$withFilter")
    }
  }
}
