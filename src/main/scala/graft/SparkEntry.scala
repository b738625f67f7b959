package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 surfaces here as a named
  * query over the driver's test tables, with (where SQL-expressible) a
  * DuckDB oracle the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All query batteries. Order defines a stable registry. */
  private def allDefs: Seq[QueryDef] =
    TpchQueries.defs ++ VectorQueries.defs ++ DocQueries.defs ++
      PipelineQueries.defs ++ ExtQueries.defs ++ MoreQueries.defs ++
      DialectQueries.defs ++ ExtraQueries.defs ++ Round2Queries.defs ++
      Round3Queries.defs ++ Round3Pipeline.defs ++ Round6Queries.defs ++
      Round7Queries.defs ++ CurationQueries.defs ++ Round8Queries.defs ++
      Round9Queries.defs ++ ProjectionQueries.defs ++ EngineQueries.defs ++
      Round10Queries.defs ++ Round11Queries.defs ++ Round12Queries.defs ++
      Round12Queries.defsPartitionOps ++ Round13Queries.defs ++
      Round14Queries.defs ++ Round15Queries.defs ++ Round16Queries.defs ++
      Round17Queries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7 v0.1 slice: Vector-SQL text with DISTANCE + NeuralArray
    * through spark.sql, filtered, exact top-k.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.install(spark)
    queries("q22_vector_sql")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { d =>
      d.name -> { (s: SparkSession, dir: String) =>
        GraftSession.install(s) // idempotent: dialect fns for plain sessions
        d.build(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.filter(_ != null).map(o => d.name -> o.trim)).toMap
}
