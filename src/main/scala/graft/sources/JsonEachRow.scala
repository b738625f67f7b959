package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S2/S3: bulk import of newline-delimited JSON with a declared schema —
  * the Spark-native form of the reference's
  * `INSERT INTO ... SELECT * FROM s3(url, 'JSONEachRow', 'schema...', 'zstd')`
  * over 113 partitioned `.jsonl.zst` parts (reference
  * `docs/self-query.md:88-99`, `docs/vector-sql.md:200-216`,
  * `README.md:122`).
  *
  * Mapping:
  *   - `s3(url, ...)`      → a glob path ("s3a://bucket/part-*.jsonl.zst"
  *     on a real cluster; any Hadoop-supported FS). Partitioned parts are
  *     just multiple files — Spark parallelizes one task per split.
  *   - `'JSONEachRow'`     → `DataFrameReader.json` line format.
  *   - declared schema     → explicit `StructType` (never inferSchema at
  *     100 TB: inference is a full extra pass over the data).
  *   - `'zstd'`            → transparent via Hadoop compression codecs
  *     (.gz/.bz2/.zst by file extension; zstd needs the codec on the
  *     cluster classpath, standard on EMR/Dataproc).
  *   - `Object('JSON')` metadata column → kept as a raw JSON string column
  *     + `get_json_object`/`from_json` at query time, mirroring the
  *     reference's own flatten-at-ingest practice (SURVEY.md §1.2).
  */
object JsonEachRow {

  def read(spark: SparkSession, schema: StructType, pathGlob: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE") // bad rows → nulls, not job failure
      .json(pathGlob)

  /** Dimension check at ingest (the reference enforces
    * `CONSTRAINT ... CHECK length(vector) = 768` in DDL,
    * `app/backend/constants/myscale_tables.py:27,36`; Spark has no table
    * constraints, so this is the ingest-time equivalent).
    */
  def requireVectorDim(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val bad = df.filter(size(col(vecCol)) =!= dim).limit(1).count()
    require(bad == 0, s"vector dim constraint violated: $vecCol must have length $dim")
    df
  }
}
