package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Catalog

/** Read-construction timing soak: locates the per-construction tax of
  * the split read (MaskProbeSoak found 1-2.4 s per readRaw CONSTRUCTION
  * while execution sits at the clean floor) by timing each step
  * readSplit performs, in isolation, twice (cold/warm). Its findings —
  * committed in PLANS.md — drove two fixes: `FsOps.listFiles` walks via
  * `listStatus` (no per-file block-location fetch, which cost ~6 ms per
  * file on LocalFileSystem), and `Catalog.snap` takes ONE tree listing
  * per construction instead of five sidecar re-listings.
  */
object ListingSoak {
  def main(args: Array[String]): Unit = {
    val rows = 8000000L
    val days = 30
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    val root = java.nio.file.Files.createTempDirectory("scratch").toString
    val cat = Catalog(spark, root)
    val df = spark.range(rows).select(
      col("id"),
      concat(lit("d"), (col("id") % days)).as("day"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .repartition(days, col("day"))
    cat.create("t", df, partitionBy = Seq("day"))
    cat.deleteWhereLight("t", col("id") % 100 < 10)
    cat.readRaw("t").count() // warm everything

    for (round <- 1 to 2) {
      println(s"round $round:")
      val ops = graft.operators.FsOps(spark)
      t("manual listStatus recursion")({
        val conf = spark.sessionState.newHadoopConf()
        val h = new org.apache.hadoop.fs.Path(s"$root/t")
        val f = h.getFileSystem(conf)
        val out = Seq.newBuilder[(String, Long, Long)]
        def walk(p: org.apache.hadoop.fs.Path): Unit =
          f.listStatus(p).foreach { st =>
            if (st.isDirectory) walk(st.getPath)
            else out += ((st.getPath.toString, st.getLen,
              st.getModificationTime))
          }
        walk(h)
        out.result().size
      })
      val all = t("dataFilesUnder")(ops.dataFilesUnder(s"$root/t"))
      println(s"    (${all.size} data files)")
      val sideList = t("listFiles(_deletes)")(
        ops.listFiles(s"$root/t/_deletes"))
      println(s"    (${sideList.size} mask files)")
      val fullRead = t("read tableDir")(spark.read.parquet(s"$root/t"))
      val expl = t("read explicit files")(
        spark.read.option("basePath", s"$root/t").parquet(all: _*))
      val tagged = t("withColumn metadata")(
        expl.withColumn("__f", col("_metadata.file_path"))
          .withColumn("__p", col("_metadata.row_index")))
      val filt = t("filter udf")({
        val m = Map("x" -> Array(1L))
        val bc = spark.sparkContext.broadcast(m)
        val live = udf((f: String, p: Long) => {
          val a = bc.value.getOrElse(f, null)
          a == null || java.util.Arrays.binarySearch(a, p) < 0
        })
        tagged.filter(live(col("__f"), col("__p")))
      })
      val dropped = t("drop")(filt.drop("__f", "__p"))
      t("schema of dropped")(dropped.schema)
      t("readRaw full")(cat.readRaw("t"))
      t("readRaw + executedPlan")(
        cat.readRaw("t").queryExecution.executedPlan)
      val pre = cat.readRaw("t")
      t("exec prebuilt count")(pre.count())
      t("exec fresh count")(cat.readRaw("t").count())
      println(s"    (fullRead cols ${fullRead.schema.size})")
    }

    // file-count scaling: the one listing a masked-read construction
    // pays is O(files) driver-side — measure the per-file cost at a
    // file count closer to a real partitioned table's
    val wide = spark.range(2000000).select(
      col("id"), concat(lit("p"), col("id") % 100).as("p"),
      (col("id") % 97).as("n"))
      .repartition(200)
    cat.create("wide", wide, partitionBy = Seq("p"))
    cat.deleteWhereLight("wide", col("n") === 13)
    cat.readRaw("wide").count() // warm
    val files = graft.operators.FsOps(spark)
      .dataFilesUnder(s"$root/wide").size
    t(s"wide ($files files) readRaw construction")(cat.readRaw("wide"))
    t(s"wide ($files files) fresh masked count")(cat.readRaw("wide").count())
    spark.stop()
  }
}
