package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's deterministic test tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. These play the role of the
  * reference's six MyScale tables (SURVEY.md §1.1): `documents`/`embeddings`
  * stand in for the KB tables (wiki.Wikipedia / default.ChatArXiv /
  * chat.private_kb — `app/backend/constants/myscale_tables.py:23-66`), and
  * `events` stands in for the append-only chat-memory stream
  * (`app/backend/chat_bot/tools.py:63-82`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects outright; read nanos as long and floor-div to microseconds.
    * DuckDB truncates ns→µs at read time the same way, so oracle parity
    * holds (ties included).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` text queries (the
    * Vector-SQL surface, SURVEY.md §3 EP1) can reference them by name.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
