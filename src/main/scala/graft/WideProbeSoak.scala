package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Catalog

/** Is the grouped mask probe's row gate HOT on cheap scans? (r14
  * verdict watch item / r15 decision soak.)
  *
  * The probe filter evaluates per fact row: UTF8String -> String
  * conversion of the file path, a hash-map lookup, and a binary
  * search. MaskProbeSoak measured it at the clean floor — but its
  * aggregate reads a 64-char sha payload, so per-row scan work hides
  * per-row probe work. The regime that would expose the gate is a
  * NARROW aggregate (8 bytes of data per row) over many rows, where
  * column pruning makes the scan almost free and the probe is the
  * only per-row JVM work left. Measured here at 8 M rows, 10% mask,
  * all files dirty:
  *
  *   - narrow agg (sum of one long) on the clean twin vs the masked
  *     table — the probe's worst case;
  *   - the sha-payload agg from MaskProbeSoak as the reference shape;
  *   - a wide agg touching 10 columns — the pruning sanity check
  *     (probe cost relatively smaller again).
  *
  * Decision rule (committed with the numbers in PLANS.md): a narrow-
  * agg overhead ratio materially above the clean floor justifies a
  * codegen Catalyst expression for the gate (UTF8String-keyed, with a
  * last-file memo — rows stream file by file, so the per-row map
  * lookup and conversion collapse to one per FILE); at-the-floor
  * means the UDF stays.
  */
object WideProbeSoak {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SOAK_ROWS", "8000000").toLong
    val days = 30
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def timedBest[T](f: => T): (T, Double) = {
      val runs = (1 to 5).map(_ => timed(f))
      (runs.head._1, runs.map(_._2).min)
    }

    val root = java.nio.file.Files.createTempDirectory("wideprobe").toString
    val cat = Catalog(spark, root)
    val df = spark.range(rows).select(
      (col("id") +: concat(lit("d"), col("id") % days).as("day") +:
        (1 to 8).map(i => (col("id") * i % 1000).as(s"n$i")) ++:
        (1 to 8).map(i => (col("id") % (100 * i)).cast("double").as(s"f$i")) ++:
        Seq(sha2(col("id").cast("string"), 256).as("payload"))): _*)
      .repartition(days, col("day"))
    cat.create("clean", df, partitionBy = Seq("day"))
    cat.create("m", df, partitionBy = Seq("day"))
    cat.deleteWhereLight("m", col("id") % 10 === 3) // 10%, every file dirty

    def narrow(t: String) = cat.readRaw(t).agg(sum("n1")).collect()(0)
    def sha(t: String) = cat.readRaw(t)
      .agg(count(lit(1)), avg(length(col("payload")))).collect()(0)
    def wide(t: String) = cat.readRaw(t).agg(
      sum("n1"), sum("n2"), sum("n3"), sum("n4"),
      avg("f1"), avg("f2"), avg("f3"), avg("f4"),
      max("id"), count(lit(1))).collect()(0)

    // warm both tables' caches + JIT on every shape
    narrow("clean"); narrow("m"); sha("clean"); sha("m")
    wide("clean"); wide("m")

    // same-run UDF replica of the pre-r15 row gate (the shape the
    // codegen expression replaced), over an identical tagged scan —
    // so gate-vs-gate never compares across machine-load epochs
    val grouped = spark.read.parquet(s"$root/m/_deletes")
      .groupBy("file").agg(sort_array(collect_list(col("pos"))).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val bcU = spark.sparkContext.broadcast(grouped)
    val liveUdf = udf((f: String, p: Long) => {
      val a = bcU.value.getOrElse(f, null)
      a == null || java.util.Arrays.binarySearch(a, p) < 0
    })
    def taggedUdf = spark.read.option("basePath", s"$root/m")
      .parquet(s"$root/m")
      .withColumn("__f", col("_metadata.file_path"))
      .withColumn("__p", col("_metadata.row_index"))
      .filter(liveUdf(col("__f"), col("__p"))).drop("__f", "__p")
    def narrowUdf() = taggedUdf.agg(sum("n1")).collect()(0)
    def shaUdf() = taggedUdf
      .agg(count(lit(1)), avg(length(col("payload")))).collect()(0)
    narrowUdf(); shaUdf() // warm

    val shapes = Seq[(String, String => Any, Option[() => Any])](
      ("narrow sum(n1) [8 B/row]", narrow, Some(() => narrowUdf())),
      ("sha count+avg(len) [64 B/row]", sha, Some(() => shaUdf())),
      ("wide 10-col agg", wide, None))
    shapes.foreach { case (label, f, udfLeg) =>
      val (_, rc) = timedBest(f("clean"))
      val (_, rm) = timedBest(f("m"))
      val udfS = udfLeg.map(g => timedBest(g())._2)
      println(f"  $label%-32s clean=$rc%6.3f s  gate=$rm%6.3f s " +
        f"(${rm / rc}%4.2fx)" + udfS.map(u =>
          f"  udf-gate=$u%6.3f s (${u / rc}%4.2fx)").getOrElse(""))
    }
    // plan sanity: the narrow masked agg must still prune columns
    val plan = cat.readRaw("m").agg(sum("n1"))
      .queryExecution.executedPlan.toString
    val rs = plan.split("ReadSchema: ").last.takeWhile(_ != '\n')
    println(s"  narrow masked ReadSchema: $rs")
    spark.stop()
  }
}
