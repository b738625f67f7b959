package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Catalog

/** Mutation-pruning soak: measure the cost shape of
  * [[Catalog.deleteWhere]] after the round-11 partition pruning — a
  * one-partition delete on a D-partition table must cost O(1/D of the
  * table), not O(table), and a no-match delete must cost only the
  * matching scan. The unpartitioned twin is the displaced behavior
  * (full keep-complement rewrite). Results committed in PLANS.md
  * ("Mutation pruning soak").
  */
object MutationSoak {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SOAK_ROWS", "6000000").toLong
    val days = 30
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: String): Long = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }

    // co-locate each day into one file (the layout a real ingest
    // produces: day-partitioned writes land one-file-ish per day)
    val df = spark.range(rows).select(
      col("id"),
      concat(lit("d"), (col("id") % days)).as("day"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .repartition(days, col("day"))

    val root = java.nio.file.Files.createTempDirectory("mut_soak").toString
    val cat = Catalog(spark, root)
    val (_, wp) = timed(cat.create("part", df, partitionBy = Seq("day")))
    val (_, wu) = timed(cat.create("flat", df))
    println(f"table: $rows rows, $days day-partitions " +
      f"(${dirBytes(s"$root/part") / 1048576} MB); create part=$wp%5.1f s flat=$wu%5.1f s")

    // one-partition delete: pruned vs the full-rewrite twin
    val pred = col("day") === "d7" && col("id") % 2 === 0
    val (_, wPruned) = timed(cat.deleteWhere("part", pred))
    val (_, wFull) = timed(cat.deleteWhere("flat", pred))
    println(f"one-partition delete: pruned=$wPruned%5.2f s vs full-rewrite=" +
      f"$wFull%5.2f s (${wFull / wPruned}%4.1fx)")
    assert(spark.read.parquet(s"$root/part").count() ==
      spark.read.parquet(s"$root/flat").count())

    // no-match delete: scan only, zero bytes rewritten
    val before = dirBytes(s"$root/part")
    val (_, wNone) = timed(cat.deleteWhere("part", col("day") === "nope"))
    println(f"no-match delete: $wNone%5.2f s, bytes rewritten=" +
      s"${dirBytes(s"$root/part") - before}")

    // TTL expiry on a day-partitioned table rides the same pruning
    val (_, wTtl) = timed(cat.deleteWhere("part", col("day").isin("d0", "d1")))
    println(f"2-of-$days-partition retention delete: $wTtl%5.2f s")

    // NESTED day=/lang= layout (round 12): cost ∝ matched LEAF dirs, not
    // the table — one leaf of day*langs; before round 12 this fell back
    // to the full rewrite
    val langs = 4
    val nested = spark.range(rows).select(
      col("id"),
      concat(lit("d"), (col("id") % days)).as("day"),
      concat(lit("l"), (col("id") % langs)).as("lang"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .repartition(days * langs, col("day"), col("lang"))
    val (_, wn) = timed(cat.create("nest", nested, partitionBy = Seq("day", "lang")))
    println(f"nested table: $rows rows, ${days * langs} day*lang leaves; " +
      f"create=$wn%5.1f s")
    val leafPred = col("day") === "d7" && col("lang") === "l1" && col("id") % 2 === 0
    val (_, wLeaf) = timed(cat.deleteWhere("nest", leafPred))
    println(f"one-leaf (1/${days * langs}) delete: $wLeaf%5.2f s " +
      f"(vs $wFull%5.2f s full-rewrite twin, ${wFull / wLeaf}%4.1fx)")
    val (_, wSub) = timed(cat.deleteWhere("nest", col("day") === "d3"))
    println(f"whole-day subtree delete ($langs leaves + ancestor): $wSub%5.2f s")
    assert(!new java.io.File(s"$root/nest/day=d3").exists())
    spark.stop()
  }
}
