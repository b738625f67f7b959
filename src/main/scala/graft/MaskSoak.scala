package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Catalog

/** Lightweight-delete soak (r11 verdict item 1): measure what the
  * deletion-vector mask buys over the partition-pruned rewrite
  * (MutationSoak's 31× baseline), and what the mask-aware read costs
  * while masks are outstanding. Shapes measured on the same
  * day-partitioned table MutationSoak uses:
  *
  *   - delete cost: [[Catalog.deleteWhereLight]] (scan + O(matches) mask
  *     write, zero data bytes rewritten) vs [[Catalog.deleteWhere]]
  *     (pruned one-partition rewrite) vs the flat-table full rewrite;
  *   - read overhead: full-table aggregate through the mask anti-join vs
  *     the same aggregate on the materialized twin;
  *   - OPTIMIZE materialization cost (the deferred rewrite, paid once).
  *
  * Results committed in PLANS.md ("Lightweight-delete soak").
  */
object MaskSoak {
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
    // best-of-3 for READ measurements: the box is shared, and a single
    // loaded wall would mis-state a ratio claim (write paths stay
    // single-shot — they mutate state)
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

    val df = spark.range(rows).select(
      col("id"),
      concat(lit("d"), (col("id") % days)).as("day"),
      sha2(col("id").cast("string"), 256).as("payload"))
      .repartition(days, col("day"))

    val root = java.nio.file.Files.createTempDirectory("mask_soak").toString
    val cat = Catalog(spark, root)
    cat.create("light", df, partitionBy = Seq("day"))
    cat.create("pruned", df, partitionBy = Seq("day"))
    cat.create("flat", df)
    println(f"table: $rows rows, $days day-partitions " +
      f"(${dirBytes(s"$root/light") / 1048576} MB)")

    // the high-QPS serving shape: a selective delete INSIDE one partition
    val pred = col("day") === "d7" && col("id") % 100 === 0
    val bytesBefore = dirBytes(s"$root/light")
    val (_, wLight) = timed(cat.deleteWhereLight("light", pred))
    val maskBytes = dirBytes(s"$root/light") - bytesBefore
    val (_, wPruned) = timed(cat.deleteWhere("pruned", pred))
    val (_, wFull) = timed(cat.deleteWhere("flat", pred))
    println(f"in-partition delete (${rows / days / 100} matches): " +
      f"mask=$wLight%5.2f s ($maskBytes bytes written, 0 data bytes) vs " +
      f"pruned-rewrite=$wPruned%5.2f s (${wPruned / wLight}%4.1fx) vs " +
      f"full-rewrite=$wFull%5.2f s (${wFull / wLight}%4.1fx)")

    // file-pruned sidecar read (round 13): with ONE partition dirty, the
    // other 29 scan on the plain vectorized path — the read tax is
    // O(dirty files), not O(table)
    def aggT(t: String) = cat.readRaw(t)
      .agg(count(lit(1)), avg(length(col("payload")))).collect()(0)
    aggT("light"); aggT("pruned") // warm
    val (_, rOneDirty) = timedBest(aggT("light"))
    val (_, rCleanTwin) = timedBest(aggT("pruned"))
    println(f"aggregate, 1 of $days partitions dirty: masked=$rOneDirty%5.2f s " +
      f"vs clean twin=$rCleanTwin%5.2f s (${rOneDirty / rCleanTwin}%4.2fx — " +
      "file-pruned sidecar read)")

    // the workload lightweight deletes EXIST for: a delete that does not
    // align with the partitioning — the pruned rewrite degrades to a
    // full-table rewrite (every partition has matches), the mask stays
    // scan + O(matches)
    val cross = col("id") % 100000 === 7
    val (_, wLightX) = timed(cat.deleteWhereLight("light", cross))
    val (_, wPrunedX) = timed(cat.deleteWhere("pruned", cross))
    println(f"cross-partition delete (${rows / 100000} matches over all " +
      f"$days partitions): mask=$wLightX%5.2f s vs partition-rewrite=" +
      f"$wPrunedX%5.2f s (${wPrunedX / wLightX}%4.1fx)")

    // ten more masked deletes: the accumulating-sidecar serving pattern
    val (_, wTen) = timed((1 to 10).foreach(i =>
      cat.deleteWhereLight("light", col("id") % 1000 === i)))
    println(f"10 further masked deletes: ${wTen / 10}%5.2f s each " +
      f"(sidecar now ${dirBytes(s"$root/light/_deletes") / 1024} KB)")

    // read overhead while masks are outstanding vs the materialized twin
    def agg(t: String) = cat.readRaw(t).agg(count(lit(1)), avg(length(col("payload"))))
      .collect()(0)
    agg("light"); agg("pruned") // warm
    val (_, rMasked) = timedBest(agg("light"))
    val (_, rClean) = timedBest(agg("pruned"))
    println(f"full-table aggregate: masked=$rMasked%5.2f s vs " +
      f"clean=$rClean%5.2f s (${rMasked / rClean}%4.2fx overhead, " +
      f"${cat.readRaw("light").count()} rows served)")

    // lightweight UPDATE (patch parts): same economics on the write side,
    // one broadcast join per outstanding batch on the read side
    val upPred = col("id") % 50000 === 3 // cross-partition, pruning can't help
    val bytesBeforeU = dirBytes(s"$root/light")
    val (_, wUpL) = timed(cat.updateWhereLight("light", upPred,
      Map("payload" -> lit("patched"))))
    val patchBytes = dirBytes(s"$root/light") - bytesBeforeU
    val (_, wUpH) = timed(cat.updateWhere("pruned", upPred,
      Map("payload" -> lit("patched"))))
    println(f"cross-partition update (${rows / 50000} matches): " +
      f"patch=$wUpL%5.2f s ($patchBytes bytes written) vs " +
      f"partition-rewrite=$wUpH%5.2f s (${wUpH / wUpL}%4.1fx)")
    val (_, rPatched) = timedBest(agg("light"))
    println(f"aggregate with mask+patch outstanding: $rPatched%5.2f s")

    // K accumulating patch batches (the reference's per-turn session
    // updates, `session_manager.py:70-88`) cost K read-side joins;
    // compactPatches folds them to ONE without touching data. Measured
    // on a mask-free twin with SUBSTANTIAL batches (each patches 1% of
    // rows) so the patch joins, not the mask anti-join, carry the tax.
    cat.create("pfold", df, partitionBy = Seq("day"))
    val (_, wBatches) = timed((0 until 8).foreach(i =>
      cat.updateWhereLight("pfold", col("id") % 100 === i,
        Map("payload" -> concat(lit("p"), col("id"))))))
    println(f"8 patch batches x ${rows / 100} rows: ${wBatches / 8}%5.2f s " +
      f"each (${dirBytes(s"$root/pfold/_patches") / 1048576} MB sidecar)")
    val (_, rK) = timedBest(agg("pfold"))
    val foldBytesBefore = dirBytes(s"$root/pfold/_patches")
    val (_, wFold) = timed(cat.compactPatches("pfold"))
    val foldBytes = dirBytes(s"$root/pfold/_patches")
    val (_, rOne) = timedBest(agg("pfold"))
    println(f"patch fold: 8 batches (${foldBytesBefore / 1048576} MB) -> 1 " +
      f"(${foldBytes / 1048576} MB) in $wFold%5.2f s, zero data bytes; " +
      f"aggregate 8-batch=$rK%5.2f s vs folded=$rOne%5.2f s " +
      f"(${rK / rOne}%4.2fx read-tax drop)")

    // the deferred rewrite, paid once at OPTIMIZE time
    val (_, wOpt) = timed(cat.replaceContents("light", cat.readRaw("light")))
    assert(!cat.hasDeletes("light"))
    val (_, rAfter) = timedBest(agg("light"))
    println(f"OPTIMIZE (mask materialization): $wOpt%5.2f s; " +
      f"aggregate after=$rAfter%5.2f s")
    spark.stop()
  }
}
