package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dual-schema events contract (SURVEY §13 round 9): testdata has
  * shipped `ts` as TIMESTAMP(NANOS) — readable only as a raw long — and
  * as native TIMESTAMP micros (loaded as TIMESTAMP_NTZ). Whatever the
  * encoding, [[Tables.normalizeTs]] must land on session-timezone
  * TimestampType with identical epoch-microsecond values, so every
  * downstream consumer (streaming battery, as-of/range joins, JSON-props
  * queries) sees one schema. This spec pins all three dispatch arms on
  * the same instants rather than trusting whichever encoding the current
  * testdata generation happens to carry.
  */
class EventsSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three instants incl. a sub-millisecond component (micros survive,
  // legacy nanos floor-div to micros) — epoch micros
  private val micros = Seq(0L, 1700000000123456L, 1700003600999999L)

  test("normalizeTs: legacy nanos-as-long, NTZ, and native timestamp agree") {
    val legacy = micros.map(_ * 1000L).toDF("ts") // nanos as raw long
    val ntz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val native = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))

    val out = Seq(legacy, ntz, native).map(Tables.normalizeTs)
    out.foreach { df =>
      assert(df.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
    }
    val vals = out.map(_.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq)
    assert(vals(0) === micros)
    assert(vals(1) === micros)
    assert(vals(2) === micros)
  }

  test("events loader: current testdata reads as session-timezone timestamps") {
    val ev = Tables.events(spark, TestSpark.sf)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
    // values are sane epoch micros (post-2000, pre-2100) — a unit slip
    // (nanos kept as micros, or micros re-divided) lands outside this
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .as[(Long, Long)].head()
    assert(mm._1 > 946684800000000L, s"min ts ${mm._1} before 2000-01-01")
    assert(mm._2 < 4102444800000000L, s"max ts ${mm._2} after 2100-01-01")
  }
}
