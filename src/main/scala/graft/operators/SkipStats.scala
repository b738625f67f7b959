package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.statistics.{BinaryStatistics, DoubleStatistics, FloatStatistics, IntStatistics, LongStatistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession

/** ClickHouse `EXPLAIN indexes = 1` analog (r11 verdict item 6): report,
  * per simple conjunct of a statement's WHERE, how many parquet ROW
  * GROUPS (CH granules) each physical index keeps — computed
  * driver-side from the same footer metadata the scan's filter pushdown
  * uses, so the numbers are exactly what execution will skip:
  *
  *   - `partition` — `col=value` directory pruning (CH's partition key);
  *   - `minmax`    — row-group min/max statistics (CH's primary-key /
  *     minmax skip index; parquet records them on every write — SURVEY
  *     §16.3, measured 26.4× in PLANS "Data skipping");
  *   - `bloom_filter` — the column bloom the `INDEX ... TYPE
  *     bloom_filter` DDL registers, consulted for equality conjuncts.
  *
  * Supported conjunct shape: `col OP literal` with OP in
  * = != < <= > >= over long/double/string columns (the shapes CH's
  * indexes answer); anything else reports `index = 'none'` with all
  * granules kept — honest "this predicate prunes nothing at the
  * metadata level", never a silent drop.
  */
object SkipStats {

  final case class Conjunct(column: String, op: String, literal: String)

  final case class IndexRow(index: String, column: String, condition: String,
    granulesTotal: Long, granulesKept: Long, filesTotal: Long, filesKept: Long)

  /** Data files of a table directory via [[FsOps]] (the Hadoop
    * `FileSystem` binding — one recursive listing, no handle to leak;
    * the data-vs-sidecar rule lives in [[FsOps.isDataFile]], shared
    * with Catalog's reads and parts()).
    */
  private def dataFiles(spark: SparkSession, tableDir: String): Seq[String] =
    FsOps(spark).dataFilesUnder(tableDir)

  /** Evaluate each conjunct against the table's files + footers. */
  def explain(spark: SparkSession, tableDir: String,
      conjuncts: Seq[Conjunct]): Seq[IndexRow] = {
    val files: Seq[String] = dataFiles(spark, tableDir)
    val conf = spark.sessionState.newHadoopConf()
    val ops = FsOps(spark)

    conjuncts.flatMap { c =>
      val cond = s"${c.column} ${c.op} ${c.literal}"
      // partition-directory pruning: the column appears as col=value in
      // the path RELATIVE to the table dir (listings are full URIs —
      // relativize through the FS so a `col=`-shaped ancestor segment
      // outside the table can never be read as a partition value)
      val partVals = files.map(f =>
        partitionValueOf(ops.relativeTo(tableDir, f).getOrElse(f), c.column))
      if (partVals.forall(_.isDefined)) {
        var total = 0L; var kept = 0L; var fKept = 0L
        files.zip(partVals).foreach { case (f, Some(v)) =>
          val n = rowGroupCount(conf, f)
          total += n
          if (compareLit(v, stripQuotes(c.literal), c.op)) { kept += n; fKept += 1 }
        case _ => ()
        }
        Seq(IndexRow("partition", c.column, cond, total, kept,
          files.size.toLong, fKept))
      } else {
        // footer statistics: minmax always (parquet writes them), bloom
        // where the footer carries one and the conjunct is an equality
        var total = 0L; var minmaxKept = 0L; var bloomKept = 0L
        var sawBloom = false
        var fTotal = 0L; var fKeptMm = 0L
        files.foreach { f =>
          val in = HadoopInputFile.fromPath(new HPath(f), conf)
          val reader = ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks.asScala.toSeq
            fTotal += 1
            var anyKeptInFile = false
            blocks.foreach { b =>
              total += 1
              val colOpt = b.getColumns.asScala
                .find(_.getPath.toDotString == c.column)
              val mmKeep = colOpt.forall(cc => minmaxKeeps(cc, c))
              if (mmKeep) { minmaxKept += 1; anyKeptInFile = true }
              val blKeep = mmKeep && colOpt.forall { cc =>
                if (c.op != "=") true
                else {
                  val bf = reader.getBloomFilterDataReader(b).readBloomFilter(cc)
                  if (bf == null) true
                  else {
                    sawBloom = true
                    bloomFinds(bf, cc, c.literal)
                  }
                }
              }
              if (blKeep) bloomKept += 1
            }
            if (anyKeptInFile) fKeptMm += 1
          } finally reader.close()
        }
        val mm = IndexRow("minmax", c.column, cond, total, minmaxKept,
          fTotal, fKeptMm)
        if (sawBloom) Seq(mm, IndexRow("bloom_filter", c.column, cond,
          total, bloomKept, fTotal, fKeptMm))
        else Seq(mm)
      }
    }
  }

  /** CH `EXPLAIN ESTIMATE` numbers for a table: (parts, rows, marks) —
    * files, footer row counts, row groups (the granule ≈ mark analog).
    * Pure footer metadata, no data read.
    */
  def estimate(spark: SparkSession, tableDir: String): (Long, Long, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    var files = 0L; var rows = 0L; var groups = 0L
    dataFiles(spark, tableDir).foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(f), conf))
      try {
        files += 1
        val blocks = reader.getFooter.getBlocks.asScala
        groups += blocks.size
        rows += blocks.map(_.getRowCount).sum
      } finally reader.close()
    }
    (files, rows, groups)
  }

  /** (row groups, files) of a table directory — the un-pruned ceiling. */
  def totals(spark: SparkSession, tableDir: String): (Long, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val files = dataFiles(spark, tableDir)
    (files.map(rowGroupCount(conf, _)).sum, files.size.toLong)
  }

  private def rowGroupCount(conf: org.apache.hadoop.conf.Configuration,
      f: String): Long = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(f), conf))
    try reader.getFooter.getBlocks.size().toLong finally reader.close()
  }

  private def partitionValueOf(rel: String, col: String): Option[String] =
    rel.split('/').toSeq
      .collectFirst { case seg if seg.startsWith(col + "=") =>
        seg.substring(col.length + 1) }

  /** Compare two literal strings: numerically when both parse, else
    * lexicographically (parquet binary stats order for UTF-8 strings).
    */
  private def compareLit(v: String, lit: String, op: String): Boolean = {
    val cmp = (scala.util.Try(v.toDouble), scala.util.Try(lit.toDouble)) match {
      case (scala.util.Success(a), scala.util.Success(b)) => a.compare(b)
      case _ => v.compareTo(lit)
    }
    op match {
      case "=" => cmp == 0
      case "!=" => cmp != 0
      case "<" => cmp < 0
      case "<=" => cmp <= 0
      case ">" => cmp > 0
      case ">=" => cmp >= 0
      case _ => true
    }
  }

  /** May this row group contain rows matching `col OP literal`, judged by
    * its min/max statistics? Missing/empty stats keep the group (honest:
    * no metadata, no pruning — the INT96 trap documented in SURVEY).
    */
  private def minmaxKeeps(
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
      c: Conjunct): Boolean = {
    val st = cc.getStatistics
    if (st == null || !st.hasNonNullValue) return true
    def keep[T](min: T, max: T, v: T)(implicit ord: Ordering[T]): Boolean =
      c.op match {
        case "=" => ord.lteq(min, v) && ord.lteq(v, max)
        case "!=" => !(ord.equiv(min, v) && ord.equiv(max, v))
        case "<" => ord.lt(min, v)
        case "<=" => ord.lteq(min, v)
        case ">" => ord.gt(max, v)
        case ">=" => ord.gteq(max, v)
        case _ => true
      }
    st match {
      case s: LongStatistics =>
        scala.util.Try(c.literal.toLong).toOption
          .forall(v => keep(s.genericGetMin.longValue(), s.genericGetMax.longValue(), v))
      case s: IntStatistics =>
        scala.util.Try(c.literal.toLong).toOption
          .forall(v => keep(s.genericGetMin.longValue(), s.genericGetMax.longValue(), v))
      case s: DoubleStatistics =>
        scala.util.Try(c.literal.toDouble).toOption
          .forall(v => keep(s.genericGetMin.doubleValue(), s.genericGetMax.doubleValue(), v))
      case s: FloatStatistics =>
        scala.util.Try(c.literal.toDouble).toOption
          .forall(v => keep(s.genericGetMin.floatValue().toDouble, s.genericGetMax.floatValue().toDouble, v))
      case s: BinaryStatistics =>
        keep(s.genericGetMin.toStringUsingUTF8, s.genericGetMax.toStringUsingUTF8,
          stripQuotes(c.literal))
      case _ => true // unsupported physical type: no metadata pruning
    }
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else s

  /** Bloom membership for an equality literal, typed by the column. */
  private def bloomFinds(bf: org.apache.parquet.column.values.bloomfilter.BloomFilter,
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
      lit: String): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    cc.getPrimitiveType.getPrimitiveTypeName match {
      case INT64 => scala.util.Try(lit.toLong).toOption
        .forall(v => bf.findHash(bf.hash(v)))
      case INT32 => scala.util.Try(lit.toInt).toOption
        .forall(v => bf.findHash(bf.hash(v)))
      case DOUBLE => scala.util.Try(lit.toDouble).toOption
        .forall(v => bf.findHash(bf.hash(v)))
      case FLOAT => scala.util.Try(lit.toFloat).toOption
        .forall(v => bf.findHash(bf.hash(v)))
      case BINARY => bf.findHash(bf.hash(Binary.fromString(stripQuotes(lit))))
      case _ => true
    }
  }
}
