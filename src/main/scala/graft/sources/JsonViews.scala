package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-inferred TYPED view over a JSON string column — the engine's
  * answer to the reference's experimental `Object('JSON')` dynamic column
  * (`app/backend/constants/myscale_tables.py:29`, enabled via
  * `SET allow_experimental_object_type=1` at
  * `app/backend/chat_bot/private_knowledge_base.py:61`).
  *
  * The raw-string + `JSONExtract*` path (q33/q70) mirrors what the
  * reference's own ingestion does (`docs/vector-sql.md:200-216`); this
  * completes the story: infer the column's schema once (offline), then
  * expose every inferred field as a typed top-level column via `from_json`
  * — downstream filters/aggregates run on native types, not string
  * re-parses per access.
  *
  * Scale posture: inference reads a bounded sample (`sampleRows`), not the
  * table — at 100 TB the schema pass must not be a second full scan. The
  * `from_json` flatten itself is a map-only projection (one parse per row
  * total, vs one per `JSONExtract*` call), stays in whole-stage codegen,
  * and prunes to nothing if no typed field is referenced.
  */
object JsonViews {

  /** Infer the JSON schema of `jsonCol` from up to `sampleRows` non-null
    * rows. Spark's JSON inference unions field sets across rows and
    * widens numeric types, so heterogeneous objects produce one nullable
    * superset struct — the Object('JSON') contract.
    */
  def inferSchema(df: DataFrame, jsonCol: String, sampleRows: Int = 100000): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol)).na.drop.limit(sampleRows).as[String]
    val inferred = spark.read.json(sample).schema
    // inference emits _corrupt_record when it meets malformed rows; the
    // typed view surfaces only real fields (bad rows parse to nulls)
    StructType(inferred.fields.filterNot(_.name.startsWith("_corrupt")))
  }

  /** The typed view: every inferred field of `jsonCol` as a top-level
    * column named `prefix + field`. The source column is kept — callers
    * that still want raw-fragment semantics (`JSONExtractArrayRaw`) keep
    * them.
    */
  def typed(df: DataFrame, jsonCol: String, prefix: String = "",
      sampleRows: Int = 100000): DataFrame = {
    val schema = inferSchema(df, jsonCol, sampleRows)
    val parsed = df.withColumn("__typed", from_json(col(jsonCol), schema))
    schema.fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(prefix + f.name, col(s"__typed.${f.name}"))
    }.drop("__typed")
  }
}
