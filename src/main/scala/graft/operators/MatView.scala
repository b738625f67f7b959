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
  *   - streaming: `writeStream.foreachBatch((b, _) => mv.insert(b))`
  *     gives the continuous MV population path (spec-gated in
  *     MatViewSpec) with exactly-once-per-batch append semantics under
  *     Spark's batch-id dedup contract.
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

  /** Aggregate one inserted block and append its partial states. An
    * append needs no flip: a crashed insert leaves only uncommitted
    * task files under `_temporary`, which readers never adopt.
    */
  def insert(batch: DataFrame): Unit =
    ProjectionCatalog.partialAgg(batch, keys, measures)
      .write.mode("append").parquet(dataDir)

  private def partials: DataFrame = spark.read.parquet(dataDir)

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
      m.write.mode("overwrite").parquet(dir))
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
        .write.mode("overwrite").parquet(dir))
    dropLegacyRootFiles(fs, path)
    mv
  }

  /** Root-level FILES of the pre-epoch layout (partial-log parquet,
    * `_SUCCESS`, crc companions) become invisible the moment a pointer
    * commits; drop them so a migrated store does not leak their bytes.
    * Strictly after the flip — a crash mid-drop leaves invisible
    * garbage, never a wrong read. Directories are left alone
    * ([[EpochStore]]'s sweep owns epoch dirs; foreign dirs are not
    * ours to delete).
    */
  private[operators] def dropLegacyRootFiles(fs: FsOps, root: String): Unit =
    fs.listChildren(root).foreach { case (n, isDir) =>
      if (!isDir) fs.rmTree(s"$root/$n")
    }
}
