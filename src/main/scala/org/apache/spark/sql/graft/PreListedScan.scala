package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation, NoopCache,
  PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A parquet scan over an EXPLICIT, pre-listed subset of a table's
  * files — with zero filesystem I/O at plan time beyond one footer
  * read for the data schema.
  *
  * `spark.read.parquet(files: _*)` treats every file as a ROOT path:
  * building its InMemoryFileIndex stats/lists each root (a distributed
  * listing job past 32 paths) at ~0.8 ms per file — ListingSoak
  * measured 14-16 s to PLAN a 17k-file branch read, twice per split
  * (dirty + clean), while the table's one recursive listing that
  * produced those very paths took under a second. This index instead
  * SERVES the listing the caller already holds (`Catalog.snap` takes
  * exactly one per masked-read construction), so split-read planning
  * is O(1) filesystem work at any file count.
  *
  * Partition values are inferred from the file paths against `base`
  * with Spark's own [[PartitioningAwareFileIndex.inferPartitioning]] —
  * the same inference `spark.read` runs, so the split read's two
  * branches cannot disagree more than two `spark.read`s would (and the
  * caller's schema-compatibility guard stays as the backstop).
  * Partition pruning works as usual: the parent's `listFiles` applies
  * partition filters against the inferred spec, so a day-scoped query
  * over a masked table still scans one day's files.
  */
object PreListedScan {

  private final class PreListedFileIndex(
      spark: SparkSession,
      base: Path,
      leaves: Seq[FileStatus])
    extends PartitioningAwareFileIndex(
      spark, Map("basePath" -> base.toString), None,
      // the parent's cache is only consulted by ITS listing flows, all
      // overridden here — the noop states that nothing is cached
      NoopCache) {

    override def rootPaths: Seq[Path] = Seq(base)

    override val leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
      val m = mutable.LinkedHashMap.empty[Path, FileStatus]
      leaves.foreach(f => m(f.getPath) = f)
      m
    }

    override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
      leaves.groupBy(_.getPath.getParent)
        .map { case (d, fs) => d -> fs.toArray }

    private lazy val spec: PartitionSpec = inferPartitioning()
    override def partitionSpec(): PartitionSpec = spec

    override def refresh(): Unit = ()
  }

  /** DataFrame over exactly `files` (path, bytes, mtime — a
    * [[graft.operators.FsOps.listFiles]] subset) under table root
    * `base`. The listing is trusted as-is; a stale entry surfaces as a
    * read error exactly as it would from a stale `InMemoryFileIndex`.
    */
  def parquet(spark: SparkSession, base: String,
      files: Seq[(String, Long, Long)]): DataFrame = {
    val statuses = files.map { case (p, len, mtime) =>
      new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime, new Path(p))
    }
    val index = new PreListedFileIndex(spark, new Path(base), statuses)
    val format = new ParquetFileFormat
    val dataSchema: StructType = footerSchema(spark, statuses)
    val relation = HadoopFsRelation(
      index,
      partitionSchema = index.partitionSpec().partitionColumns,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = format,
      options = Map.empty)(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(relation, isStreaming = false))
  }

  /** Data schema of a parquet file set, resolved DRIVER-SIDE from one
    * footer — the exact value `ParquetFileFormat.inferSchema` with
    * `mergeSchema=false` computes, minus the 1-task Spark job it runs
    * to compute it. Spark's non-merging inference touches exactly ONE
    * file — the lexicographically first data file
    * (`ParquetUtils.splitFiles` sorts by path) — and reads its footer
    * in a `mergeSchemasInParallel` job whose scheduling costs ~25 ms
    * plus a planning gap per statement; a statement-heavy mutation
    * lifecycle pays that job once per read CONSTRUCTION (R17JobProf:
    * 15 of q251's 52 jobs were these). The same footer read is
    * microseconds of driver I/O here, through the same metadata path
    * the job's task uses ([[ParquetFileFormat.readSchemaFromFooter]]:
    * the Spark-written schema JSON in the footer's key-value metadata
    * when present, the parquet->catalyst conversion otherwise), with
    * the same converter flags and the same `asNullable` relaxation
    * `spark.read` applies to every file-source schema.
    */
  def footerSchema(spark: SparkSession,
      statuses: Seq[FileStatus]): StructType = {
    import org.apache.parquet.format.converter.ParquetMetadataConverter
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.spark.sql.execution.datasources.parquet.{
      ParquetFooterReader, ParquetToSparkSchemaConverter}
    require(statuses.nonEmpty,
      "PreListedScan: cannot infer a parquet schema from zero files")
    val first = statuses.minBy(_.getPath.toString)
    val conf = spark.sessionState.newHadoopConf()
    val meta = ParquetFooterReader.readFooter(
      HadoopInputFile.fromStatus(first, conf),
      ParquetMetadataConverter.SKIP_ROW_GROUPS)
    val converter = new ParquetToSparkSchemaConverter(
      spark.sessionState.conf)
    ParquetFileFormat.readSchemaFromFooter(
      new org.apache.parquet.hadoop.Footer(first.getPath, meta), converter)
      .asNullable
  }

  /** [[footerSchema]] over raw (path, len, mtime) listing entries. */
  def footerSchemaOf(spark: SparkSession,
      files: Seq[(String, Long, Long)]): StructType =
    footerSchema(spark, files.map { case (p, len, mtime) =>
      new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime, new Path(p))
    })

  /** Total row count of a parquet file set, summed from footer block
    * metadata DRIVER-SIDE — no Spark job. Lets a write-then-decide
    * caller (e.g. a sidecar fold that must branch on "did anything
    * survive the filter?") execute its plan ONCE and read the emptiness
    * off the files it just wrote, instead of running `isEmpty` (a full
    * plan execution) before the write runs the same plan again — at
    * scale that probe is a second data-proportional pass.
    */
  def footerRowCount(spark: SparkSession,
      files: Seq[(String, Long, Long)]): Long = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.format.converter.ParquetMetadataConverter
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFooterReader
    val conf = spark.sessionState.newHadoopConf()
    files.map { case (p, len, mtime) =>
      val st = new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime,
        new Path(p))
      ParquetFooterReader.readFooter(
        HadoopInputFile.fromStatus(st, conf),
        ParquetMetadataConverter.NO_FILTER)
        .getBlocks.asScala.map(_.getRowCount).sum
    }.sum
  }
}
