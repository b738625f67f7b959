package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Catalog

/** Mask-probe representation soak (r13 runway #1, judge-endorsed with a
  * measure-first guard): at very large masks the read-side LEFT ANTI
  * join probes a (file, pos) string-keyed hash per fact row, and the
  * build side carries the FULL file-path string once per masked row —
  * the question is whether a per-file sorted-positions representation
  * (one path string per file + 8 bytes per position, probed by binary
  * search) pays enough to replace the join.
  *
  * Measured here at mask sizes 1% / 10% / 30% of an 8 M-row,
  * 30-partition table:
  *   - the CURRENT read path ([[Catalog.readRaw]] — since this soak's
  *     first run decided it, the broadcast GROUPED PROBE under the cap);
  *   - the r13 shape as an explicit replica: LEFT ANTI broadcast join
  *     of the tagged scan against the raw (file, pos) mask;
  *   - the clean twin (no mask) as the floor;
  *   - the two representations' build-side weights (entries x path vs
  *     paths + 8 B x entry).
  *
  * Results committed in PLANS.md ("Mask-probe representation soak") —
  * first run (pre-change) was the decision gate; the post-change run
  * confirms [[Catalog.readRaw]] itself now reads at the clean floor.
  */
object MaskProbeSoak {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SOAK_ROWS", "8000000").toLong
    val days = 30
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def timedBest[T](f: => T): (T, Double) = {
      val runs = (1 to 3).map(_ => timed(f))
      (runs.head._1, runs.map(_._2).min)
    }
    def dirBytes(p: String): Long = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }

    val root = java.nio.file.Files.createTempDirectory("probe_soak").toString
    val cat = Catalog(spark, root)
    val df = spark.range(rows).select(
      col("id"),
      concat(lit("d"), (col("id") % days)).as("day"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .repartition(days, col("day"))
    cat.create("clean", df, partitionBy = Seq("day"))
    def agg(t: String) = cat.readRaw(t)
      .agg(count(lit(1)), avg(length(col("payload")))).collect()(0)
    agg("clean") // warm
    val (_, rClean) = timedBest(agg("clean"))
    println(f"table: $rows rows, $days partitions " +
      f"(${dirBytes(s"$root/clean") / 1048576} MB); clean agg $rClean%5.2f s")

    for (pct <- Seq(1, 10, 30)) {
      val t = s"m$pct"
      cat.create(t, df, partitionBy = Seq("day"))
      // cross-partition mask hitting pct% of every file (the shape that
      // defeats file pruning — all files dirty, the probe is the cost)
      cat.deleteWhereLight(t, col("id") % 100 < pct)
      val maskBytes = dirBytes(s"$root/$t/_deletes")
      val masked = rows * pct / 100

      agg(t) // warm (also folds + broadcasts the grouped probe)
      val (_, rProbe) = timedBest(agg(t))
      val (grouped, wGroup) = timed {
        spark.read.parquet(s"$root/$t/_deletes")
          .groupBy("file").agg(sort_array(collect_list(col("pos"))).as("ps"))
          .collect().map(r => r.getString(0) ->
            r.getSeq[Long](1).toArray).toMap
      }
      val pathBytes = grouped.keysIterator.map(_.length).sum
      val joinBuildB = masked * (pathBytes / math.max(grouped.size, 1) + 8)
      val arrBuildB = pathBytes + 8L * masked

      // the r13 shape, replicated explicitly: broadcast LEFT ANTI join
      // against the raw (file, pos) entries over the same tagged scan
      val m = spark.read.parquet(s"$root/$t/_deletes")
        .select(col("file").as("__f"), col("pos").as("__p"))
      def aggJoin() = spark.read.option("basePath", s"$root/$t")
        .parquet(s"$root/$t")
        .withColumn("__f", col("_metadata.file_path"))
        .withColumn("__p", col("_metadata.row_index"))
        .join(broadcast(m), Seq("__f", "__p"), "left_anti")
        .agg(count(lit(1)), avg(length(col("payload")))).collect()(0)
      val nJoin = aggJoin() // warm + correctness cross-check
      val nProbe = agg(t)
      assert(nProbe.getLong(0) == nJoin.getLong(0),
        s"probe disagrees: ${nProbe.getLong(0)} vs ${nJoin.getLong(0)}")
      val (_, rJoin) = timedBest(aggJoin())
      // split construction (planning: listings, memo lookups, file-list
      // reads) vs execution on a prebuilt frame — locates the tax
      val (dfPre, wCons) = timed(cat.readRaw(t))
      val (_, rExec) = timedBest(
        dfPre.agg(count(lit(1)), avg(length(col("payload")))).collect()(0))
      println(f"  [$t] construction=$wCons%5.2f s, prebuilt exec=$rExec%5.2f s")

      println(f"mask $pct%2d%% ($masked%8d entries, sidecar ${maskBytes / 1048576}%3d MB " +
        f"parquet; build side: join ~${joinBuildB / 1048576}%4d MB vs " +
        f"grouped ~${arrBuildB / 1048576}%4d MB): readRaw grouped-probe=" +
        f"$rProbe%5.2f s (${rProbe / rClean}%4.2fx clean) vs r13 anti-join=" +
        f"$rJoin%5.2f s (${rJoin / rClean}%4.2fx; fold $wGroup%5.2f s " +
        "once/epoch, cached)")
    }

    // the OVER-CAP regime gap (r15 runway #1's measure-first gate): a
    // mask past the broadcast cap falls to the shuffle_hash anti-join —
    // force that regime on the 30% mask by shrinking the cap, and
    // measure what a representation that kept it broadcastable (bitmap
    // positions, ~8x smaller than the sorted-Long arrays) would buy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    spark.conf.set("spark.graft.sidecarBroadcastBytes", "1")
    val (_, rShuffle) = timedBest(agg("m30"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.unset("spark.graft.sidecarBroadcastBytes")
    val (_, rProbe30) = timedBest(agg("m30"))
    println(f"over-cap regime gap @30%% mask: shuffle_hash anti-join=" +
      f"$rShuffle%5.2f s vs grouped-probe=$rProbe30%5.2f s " +
      f"(${rShuffle / rProbe30}%4.1fx — what keeping a mask broadcastable buys)")
    spark.stop()
  }
}
