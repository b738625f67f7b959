package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The ClickHouse CSV format family beside [[JsonEachRow]]: `CSV`,
  * `CSVWithNames`, `TSV`/`TabSeparated`, `TSVWithNames` — the other bulk
  * import/export formats the reference's `s3(...)` ingest path accepts
  * (reference `docs/self-query.md:94-97` uses JSONEachRow; ClickHouse
  * "Formats for Input and Output Data" defines the CSV/TSV siblings every
  * CH deployment also round-trips).
  *
  * Spark-native mapping: `DataFrameReader.csv` with an explicit schema —
  * NEVER inferSchema at 100 TB (inference is a full extra pass), which is
  * also exactly the CH contract (the format string carries the schema).
  * `WithNames` ⇔ `header` option; TSV ⇔ `sep='\t'`. Compression is
  * transparent by file extension, as with JSONEachRow. Multi-file globs
  * parallelize one task per split; export writes one file per partition
  * (repartition upstream to control part count).
  *
  * CH NULL spelling: `\N` both ways (ClickHouse `format_csv_null_*`
  * defaults) — set explicitly so a round-trip through DuckDB/CH agrees.
  */
object CsvFormat {

  sealed trait Flavor {
    def sep: String; def header: Boolean
  }
  case object Csv extends Flavor { val sep = ","; val header = false }
  case object CsvWithNames extends Flavor { val sep = ","; val header = true }
  case object Tsv extends Flavor { val sep = "\t"; val header = false }
  case object TsvWithNames extends Flavor { val sep = "\t"; val header = true }

  def read(spark: SparkSession, schema: StructType, pathGlob: String,
      flavor: Flavor = CsvWithNames): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", flavor.sep)
      .option("header", flavor.header.toString)
      .option("nullValue", "\\N")
      .option("mode", "PERMISSIVE") // bad rows → nulls, not job failure
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(pathGlob)

  def write(df: DataFrame, path: String, flavor: Flavor = CsvWithNames): Unit =
    df.write.mode("overwrite")
      .option("sep", flavor.sep)
      .option("header", flavor.header.toString)
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)
}
