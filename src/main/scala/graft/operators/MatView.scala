package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ProjectionCatalog
import org.apache.spark.sql.graft.ProjectionCatalog.Measure

/** ClickHouse `CREATE MATERIALIZED VIEW .. ENGINE=AggregatingMergeTree`
  * semantics on parquet: an INCREMENTALLY maintained rollup.
  *
  * ClickHouse's contract (docs "AggregatingMergeTree" + "Materialized
  * View"): each INSERT into the source table aggregates ONLY the inserted
  * block and appends partial-state rows to the view; background merges
  * (and `OPTIMIZE`, and read-time `-Merge` finalizers) combine partials.
  * The view never re-reads the base table — that is what makes it viable
  * when the base is 100 TB and a batch is a few GB.
  *
  * Spark-first mapping, no custom machinery needed because the partial
  * state is the classic re-aggregable algebra
  * ([[ProjectionCatalog.partialAgg]]):
  *
  *   - [[insert]]     = partial-aggregate the BATCH (one shuffle over the
  *     batch alone) and append its rollup rows — the MV directory is an
  *     append-only log of partial states, exactly like AMT parts;
  *   - [[read]]       = merge-on-read finalize (`sumMerge`/`minMerge`/..
  *     analog): one aggregate over the rollup rows, orders of magnitude
  *     smaller than the base;
  *   - [[compact]]    = `OPTIMIZE TABLE .. FINAL`: collapse history to
  *     one row per key so the partial log stays bounded by
  *     |keys| regardless of insert count;
  *   - streaming: `writeStream.foreachBatch((b, id) => mv.insertBatch(b,
  *     id))` gives the continuous MV population path (spec-gated in
  *     MatViewSpec, replay included) with exactly-once-per-batch
  *     semantics — partials land as a dynamic overwrite of their own
  *     `__bid=N` partition, so a foreachBatch replay rewrites instead
  *     of double counting. (Plain [[insert]] is the ad-hoc
  *     at-least-once append; it used to carry this claim unearned.)
  *
  * Exactness matches the projection contract: integral/decimal-cast sums
  * and counts/min/max are exact under any insert split; double sums
  * re-associate (ClickHouse's AMT has the identical property).
  */
final case class MatView(
    spark: SparkSession,
    path: String,
    keys: Seq[String],
    measures: Seq[Measure]) {

  private val fs = FsOps(spark)

  /** The live partial-log directory: the committed epoch under the
    * pointer flip ([[EpochStore]]), or `path` itself for a legacy
    * artifact written before the store existed.
    */
  private def dataDir: String = EpochStore.resolve(fs, path)

  /** Aggregate one inserted block and append its partial states (the
    * AD-HOC insert: at-least-once — a caller that retries it double
    * counts; streaming population uses [[insertBatch]]). An append
    * needs no flip: a crashed insert leaves only uncommitted task
    * files under `_temporary`, which readers never adopt.
    */
  def insert(batch: DataFrame): Unit = {
    ensureBidLayout()
    ProjectionCatalog.partialAgg(batch, keys, measures)
      .withColumn("__bid", lit(MatView.AdhocBid))
      .write.mode("append").partitionBy("__bid").parquet(dataDir)
  }

  /** Streaming population with EXACTLY-ONCE-per-batch semantics: the
    * partial rows land partitioned by the stream's batch id, as a
    * dynamic-partition overwrite of exactly their own `__bid=N`
    * directory — a foreachBatch REPLAY after failure rewrites the same
    * directory to the same contents instead of double counting (the
    * same idempotent-sink pattern [[MvccCatalog.append]] uses; the
    * plain [[insert]] append is at-least-once and previously carried
    * this claim without earning it). Caveat shared by every folding
    * sink: [[compact]] erases batch-dir identity, so run it while the
    * stream is stopped — a replay of a batch the fold already absorbed
    * would re-apply it.
    */
  def insertBatch(batch: DataFrame, batchId: Long): Unit = {
    require(batchId >= 0,
      "insertBatch: stream batch ids are non-negative (ad-hoc inserts use insert())")
    ensureBidLayout()
    ProjectionCatalog.partialAgg(batch, keys, measures)
      .withColumn("__bid", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bid").parquet(dataDir)
  }

  /** Pre-r16 artifacts stored the partial log FLAT; `__bid=N`
    * partition dirs cannot mix with flat files in one directory
    * (Spark's partition discovery refuses conflicting structures), so
    * the first write into a flat legacy store folds it under the flip
    * first — one compact, after which every layout is bid-partitioned.
    */
  private def ensureBidLayout(): Unit =
    if (!EpochStore.isEpochal(fs, path) &&
        fs.listChildren(path).exists { case (n, d) =>
          !d && n.endsWith(".parquet") })
      compact()

  private def partials: DataFrame = {
    // FastRead: no plan-time schema-inference job per read
    val df = FastRead.dir(spark, fs, dataDir)
    if (df.columns.contains("__bid")) df.drop("__bid") else df
  }

  /** Merge partial states (no finalize): same schema as the stored rows,
    * one row per key. Used by both [[read]] and [[compact]].
    */
  def merged: DataFrame = {
    val df = partials
    val aggs = measures.flatMap { m =>
      val sumT = df.schema(s"__sum_${m.colName}").dataType
      Seq(
        sum(col(s"__sum_${m.colName}")).cast(sumT).as(s"__sum_${m.colName}"),
        min(col(s"__min_${m.colName}")).as(s"__min_${m.colName}"),
        max(col(s"__max_${m.colName}")).as(s"__max_${m.colName}"),
        sum(col(s"__cnt_${m.colName}")).as(s"__cnt_${m.colName}"))
    } :+ sum(col("__cnt")).as("__cnt")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Finalized view: keys + `sum_m`/`min_m`/`max_m`/`cnt_m` per measure
    * plus row count `cnt` — the `-Merge` combinator read.
    */
  def read(): DataFrame = {
    val m = merged
    val finalCols = keys.map(col) ++ measures.flatMap { mm =>
      Seq(
        col(s"__sum_${mm.colName}").as(s"sum_${mm.colName}"),
        col(s"__min_${mm.colName}").as(s"min_${mm.colName}"),
        col(s"__max_${mm.colName}").as(s"max_${mm.colName}"),
        col(s"__cnt_${mm.colName}").as(s"cnt_${mm.colName}"))
    } :+ col("__cnt").as("cnt")
    m.select(finalCols: _*)
  }

  /** OPTIMIZE FINAL: bound the partial log at one row per key. The
    * collapsed log is built BESIDE the live one and committed by a
    * pointer flip — a kill anywhere before the flip leaves the old
    * partial log serving exactly (the retired `rm(dst); move(src,
    * dst)` swap here was the r15 verdict's matview crash window: a
    * kill between the two left the view EMPTY while its base kept
    * serving); a kill after the flip leaves the new log serving, with
    * the superseded directory swept by the next commit.
    */
  def compact(): Unit = {
    val m = merged // plans against the CURRENT epoch — write-beside
    EpochStore.commit(fs, path)(dir =>
      m.withColumn("__bid", lit(MatView.BackfillBid))
        .write.mode("overwrite").partitionBy("__bid").parquet(dir))
    MatView.dropLegacyRootFiles(fs, path) // after the flip: invisible
  }

  /** Stored partial rows (for bounds checks / inspection). */
  def partialCount(): Long = partials.count()
}

object MatView {

  /** Create from an initial load of the base (the CREATE .. AS SELECT
    * backfill); subsequent [[MatView.insert]] calls never touch the base
    * again. Committed as an epoch under the pointer flip, so a kill
    * mid-backfill never leaves a half-written artifact a reader would
    * adopt (direct `mode("overwrite")` onto the live dir — Spark's
    * delete-then-write — did).
    */
  def create(spark: SparkSession, path: String, keys: Seq[String],
      measures: Seq[Measure], initial: DataFrame): MatView = {
    val mv = MatView(spark, path, keys, measures)
    val fs = FsOps(spark)
    EpochStore.commit(fs, path)(dir =>
      ProjectionCatalog.partialAgg(initial, keys, measures)
        .withColumn("__bid", lit(BackfillBid))
        .write.mode("overwrite").partitionBy("__bid").parquet(dir))
    dropLegacyRootFiles(fs, path)
    mv
  }

  /** Partition-slot ids for non-stream partial rows: the CREATE
    * backfill / compact output, and ad-hoc [[MatView.insert]] appends.
    * Negative so they can never collide with a stream's batch ids
    * (a collision under [[MatView.insertBatch]]'s dynamic overwrite
    * would silently REPLACE an unrelated batch's rows).
    */
  private[operators] val BackfillBid = -1L
  private[operators] val AdhocBid = -2L

  /** Root-level FILES of the pre-epoch layout (partial-log parquet,
    * `_SUCCESS`, crc companions) AND root-level `__bid=*` partition
    * dirs (a view populated through the bare constructor writes its
    * partial log at the root until the first flip — without this they
    * leak forever, the exact `__v=*` shape
    * [[MvccCatalog.dropLegacyData]] already handles) become invisible
    * the moment a pointer commits; drop them so a migrated store does
    * not leak their bytes. Strictly after the flip — a crash mid-drop
    * leaves invisible garbage, never a wrong read. Other directories
    * are left alone ([[EpochStore]]'s sweep owns epoch dirs; foreign
    * dirs are not ours to delete).
    */
  private[operators] def dropLegacyRootFiles(fs: FsOps, root: String): Unit =
    fs.listChildren(root).foreach { case (n, isDir) =>
      if (!isDir || n.startsWith("__bid="))
        fs.rmTree(s"$root/$n")
    }
}
