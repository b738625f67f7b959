package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Catalog, FsOps, Manifest}

/** Manifest-vs-listing construction soak at a 10^5-file table — the
  * round-15 evidence line for SURVEY §23 item 2 / the r14 verdict's #1.
  *
  * Measures, on the SAME table and with a correctness cross-check
  * between the modes:
  *
  *   1. masked-read CONSTRUCTION time served from the manifest (cold
  *      parse + warm cache) vs from the tree listing — the claim under
  *      test is O(1) vs O(files);
  *   2. the commit cost a mutation pays to maintain the manifest (one
  *      tree listing + a gzipped snapshot write) and the snapshot's
  *      on-disk size;
  *   3. execution parity (counts equal in both modes — the plans may
  *      differ, the rows must not).
  *
  * Local-disk listings run ~0.05 ms/file, object-store LISTs page
  * 1 000 objects per round-trip: the measured listing wall here maps
  * to 10^2 paged S3 calls at this file count, which is what the
  * manifest's one small-dir LIST replaces.
  */
object ManifestSoak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label: $s%8.3f s"); (r, s)
    }
    val root = java.nio.file.Files.createTempDirectory("mansoak").toString
    val cat = Catalog(spark, root)
    val fs = FsOps(spark)

    // ~100k files: 500 partition values x 200 writer tasks
    println("building 10^5-file table (one-time)...")
    val df = spark.range(2000000).select(
      col("id"),
      concat(lit("p"), col("id") % 500).as("p"),
      (col("id") % 97).as("n"))
      .repartition(200)
    t("create (incl. first manifest commit)")(
      cat.create("t", df, partitionBy = Seq("p")))
    val files = fs.dataFilesUnder(s"$root/t").size
    println(s"  ($files data files)")
    val (_, commitWall) = t("mutation commit cost: deleteWhereLight " +
      "(find-matches scan + mask write + relist + snapshot)")(
      cat.deleteWhereLight("t", col("n") === 13))
    val snapBytes = fs.listFiles(s"$root/t/_manifest")
      .filter(_._1.contains("/snap-")).map(_._2).max
    println(s"  (latest snapshot: $snapBytes bytes gzipped)")

    val expected = cat.readRaw("t").count()

    println("manifest-served construction:")
    graft.operators.Catalog.manifestCache.clear()
    graft.operators.Catalog.readFrameCache.clear()
    val (_, cold) = t("cold (parse snapshot + build frame)")(cat.readRaw("t"))
    val rebuilds = (1 to 3).map { i =>
      graft.operators.Catalog.readFrameCache.clear()
      t(s"rebuild $i (cached parse, frame rebuilt)")(cat.readRaw("t"))._2
    }
    val warms = (1 to 5).map(i =>
      t(s"warm $i (epoch frame-cache hit, one _manifest LIST)")(
        cat.readRaw("t"))._2)
    val (mc, _) = t("manifest masked count")(cat.readRaw("t").count())
    require(mc == expected)

    println("listing-served construction (manifest dropped; tree is")
    println("listing-consistent — no flip rewrite ran):")
    fs.rmTree(s"$root/t/_manifest")
    graft.operators.Catalog.manifestCache.clear()
    val lists = (1 to 2).map(i =>
      t(s"listing $i (one recursive tree LIST + branch planning)")(
        cat.readRaw("t"))._2)
    val (lc, _) = t("listing masked count")(cat.readRaw("t").count())
    require(lc == expected, s"mode mismatch: $lc vs $expected")

    t("refreshManifest (repair hatch: relist + commit)")(
      cat.refreshManifest("t"))
    require(cat.readRaw("t").count() == expected)

    println(f"\nsummary: files=$files%d  manifest cold=${cold}%.3f s  " +
      f"rebuild min=${rebuilds.min}%.3f s  warm min=${warms.min}%.4f s  " +
      f"listing min=${lists.min}%.3f s  " +
      f"rebuild speedup=${lists.min / rebuilds.min}%.0fx  " +
      f"warm speedup=${lists.min / warms.min}%.0fx  " +
      f"commit=${commitWall}%.3f s  snapshot=${snapBytes}%d B")
    val m = Manifest.load(fs, s"$root/t").get
    println(s"manifest entries=${m.entries.size} remove=${m.remove.size}")

    // --- r16: the action-log gate at 10^6 entries -----------------------
    // The r15 runway question (SURVEY §24 #1 / verdict #5): does the
    // per-mutation O(live files) snapshot REWRITE dominate mutation
    // walls at a 10^6-file table, justifying a Delta-style append-only
    // action log + checkpoints? The entry LIST is synthesized (building
    // 10^6 real files is an hours-scale setup that adds nothing — the
    // snapshot write never touches the files, only their names), the
    // commit is the REAL [[Manifest.commit]]: sort + serialize + gzip +
    // tmp write + rename + retention sweep.
    val n6 = sys.env.getOrElse("SOAK_SNAP_ENTRIES", "1000000").toInt
    val entries6 = (0 until n6).map { i =>
      Manifest.Entry(
        f"p=${i % 2000}/part-$i%07d-${java.util.UUID.nameUUIDFromBytes(Array(i.toByte, (i >> 8).toByte)).toString.take(8)}.c000.snappy.parquet",
        1L << 20, 1700000000000L + i)
    }
    val root6 = java.nio.file.Files.createTempDirectory("mansoak6").toString
    var seq6 = 0L
    val walls6 = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      seq6 = Manifest.commit(fs, root6, seq6, entries6, Nil).seq
      (System.nanoTime() - t0) / 1e9
    }
    val (_, len6) = Manifest.latestMeta(fs, root6).get
    println(f"snapshot commit at $n6%,d entries: best ${walls6.min}%.3f s " +
      f"avg ${walls6.sum / walls6.size}%.3f s  size $len6%,d B gzipped")
    t(f"snapshot parse at $n6%,d entries (read + gunzip + parse)")(
      Manifest.load(fs, root6))
    spark.stop()
  }
}
