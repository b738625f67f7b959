package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GeoOps
import org.apache.spark.unsafe.types.UTF8String

/** Geo dialect (greatCircleDistance / pointInPolygon / geohash) and the
  * entropy aggregate: geometric identities, public geohash test vectors,
  * exact integer-coordinate polygon classification, and entropy's
  * partitioning-exact summation.
  */
class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val R = GeoOps.EarthRadiusM

  test("great-circle identities: zero, symmetry, quarter arc, antipodes") {
    assert(GeoOps.greatCircle(2.35, 48.85, 2.35, 48.85) === 0.0)
    val d1 = GeoOps.greatCircle(2.3522, 48.8566, -0.1276, 51.5072)
    val d2 = GeoOps.greatCircle(-0.1276, 51.5072, 2.3522, 48.8566)
    assert(d1 === d2)
    // Paris–London is ~343.5 km on any reasonable Earth model
    assert(d1 > 340000.0 && d1 < 348000.0)
    // 90° of longitude along the equator = quarter circumference
    assert(math.abs(GeoOps.greatCircle(0, 0, 90, 0) - math.Pi / 2 * R) < 1.0)
    // pole to pole = half circumference
    assert(math.abs(GeoOps.greatCircle(0, -90, 0, 90) - math.Pi * R) < 1.0)
  }

  test("pointInPolygon: convex, concave, boundary=inside, loud bad input") {
    def poly(xs: Seq[Double], ys: Seq[Double])(x: Double, y: Double): Boolean =
      GeoOps.pointInPolygon(x, y,
        ArrayData.toArrayData(xs.toArray), ArrayData.toArrayData(ys.toArray))
    val square = poly(Seq(0.0, 10, 10, 0), Seq(0.0, 0, 10, 10)) _
    assert(square(5, 5) && !square(15, 5) && !square(5, -1))
    assert(square(10, 5), "edge point counts inside")
    assert(square(0, 0), "vertex counts inside")
    // L-shape (concave): (0,0)(4,0)(4,2)(2,2)(2,4)(0,4)
    val ell = poly(Seq(0.0, 4, 4, 2, 2, 0), Seq(0.0, 0, 2, 2, 4, 4)) _
    assert(ell(1, 3) && ell(3, 1) && !ell(3, 3))
    assert(ell(2, 3), "concave boundary edge counts inside")
    intercept[IllegalArgumentException] {
      poly(Seq(0.0, 1), Seq(0.0, 1))(0, 0)
    }
  }

  test("geohash: public vectors, round trip, precision clamp") {
    // the canonical example pair (lon 10.40744, lat 57.64911)
    assert(GeoOps.geohashEncode(10.40744, 57.64911, 11).toString === "u4pruydqqvj")
    assert(GeoOps.geohashEncode(-5.603, 42.605, 5).toString === "ezs42")
    val c = GeoOps.geohashDecode(UTF8String.fromString("ezs42"))
    assert(math.abs(c(0) - -5.60302734375) < 1e-12)
    assert(math.abs(c(1) - 42.60498046875) < 1e-12)
    // decode(encode(p)) cell center stays within the cell error bounds
    val h = GeoOps.geohashEncode(2.3522, 48.8566, 9)
    val back = GeoOps.geohashDecode(h)
    assert(math.abs(back(0) - 2.3522) < 0.0001 && math.abs(back(1) - 48.8566) < 0.0001)
    // precision clamps to [1, 12]
    assert(GeoOps.geohashEncode(0, 0, 99).numChars() === 12)
    assert(GeoOps.geohashEncode(0, 0, -3).numChars() === 1)
    intercept[IllegalArgumentException] {
      GeoOps.geohashDecode(UTF8String.fromString("ab!"))
    }
  }

  test("entropy: exact closed forms and partitioning-exact doubles") {
    GraftSession.install(spark)
    import spark.implicits._
    // 2 equiprobable values -> 1 bit; constant -> 0; 8 uniform -> 3 bits
    Seq("a", "a", "b", "b").toDF("v").createOrReplaceTempView("ent2")
    assert(spark.sql("SELECT entropy(v) FROM ent2").head().getDouble(0) === 1.0)
    Seq(7L, 7L, 7L).toDF("v").createOrReplaceTempView("ent1")
    assert(spark.sql("SELECT entropy(v) FROM ent1").head().getDouble(0) === 0.0)
    (0 until 64).map(i => i % 8).toDF("v").createOrReplaceTempView("ent8")
    assert(spark.sql("SELECT entropy(v) FROM ent8").head().getDouble(0) === 3.0)
    // skewed distribution: bit-identical under different partitionings
    val df = (1 to 10000).map(i => (i % 997).toLong).toDF("v")
    def h(parts: Int): Double = {
      df.repartition(parts).createOrReplaceTempView("ent_p")
      spark.sql("SELECT entropy(v) FROM ent_p").head().getDouble(0)
    }
    assert(h(1) === h(13), "sorted-key summation must make entropy exact")
  }

  test("SQL surface: geo functions compose in a plan") {
    GraftSession.install(spark)
    val r = spark.sql("""
      SELECT CAST(round(greatCircleDistance(2.3522D, 48.8566D, -0.1276D, 51.5072D)) AS BIGINT) AS d,
             geoDistance(0D, 0D, 0D, 0D) AS z,
             pointInPolygon(5D, 5D, array(0D, 10D, 10D, 0D), array(0D, 0D, 10D, 10D)) AS inside,
             geohashEncode(10.40744D, 57.64911D, 5) AS gh,
             geohashDecode('ezs42').longitude AS lon
      FROM (SELECT 1)""").head()
    assert(r.getLong(0) > 340000L && r.getLong(0) < 348000L)
    assert(r.getDouble(1) === 0.0)
    assert(r.getBoolean(2))
    assert(r.getString(3) === "u4pru")
    assert(math.abs(r.getDouble(4) - -5.60302734375) < 1e-12)
  }
}
