package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse geo dialect: great-circle distance, point-in-polygon, and
  * geohash. All pure per-row arithmetic (codegen'd, no state), so the
  * family rides whole-stage codegen at any scale.
  */
object GeoOps {
  /** Mean Earth radius in meters (IUGG R1, the value ClickHouse's
    * great-circle math is calibrated to).
    */
  final val EarthRadiusM = 6371008.8

  /** Haversine great-circle distance in meters; lon/lat in degrees
    * (ClickHouse argument order is lon1, lat1, lon2, lat2).
    */
  def greatCircle(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = math.toRadians(lat1)
    val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1)
    val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2.0 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** CH greatCircleAngle: the central angle in DEGREES between two
    * lon/lat points — the haversine angle without the radius scaling.
    */
  def greatCircleAngle(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    math.toDegrees(greatCircle(lon1, lat1, lon2, lat2) / EarthRadiusM)

  /** Ray casting with an explicit on-boundary rule: points ON an edge or
    * vertex count as INSIDE (deterministic — ClickHouse leaves boundary
    * behavior unspecified). Polygon as parallel x/y vertex arrays, closed
    * implicitly (last vertex connects to first).
    */
  def pointInPolygon(x: Double, y: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    val n = xs.numElements()
    require(n == ys.numElements() && n >= 3,
      s"pointInPolygon needs >=3 vertices and equal-length arrays, got $n/${ys.numElements()}")
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      val xi = xs.getDouble(i); val yi = ys.getDouble(i)
      val xj = xs.getDouble(j); val yj = ys.getDouble(j)
      // on-segment check (exact for integral coordinates)
      val cross = (xj - xi) * (y - yi) - (yj - yi) * (x - xi)
      if (cross == 0.0 &&
          x >= math.min(xi, xj) && x <= math.max(xi, xj) &&
          y >= math.min(yi, yj) && y <= math.max(yi, yj)) return true
      if ((yi > y) != (yj > y)) {
        val t = (xj - xi) * (y - yi) / (yj - yi) + xi
        if (x < t) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash (Niemeyer 2008): interleave lon/lat bisection bits,
    * base32-encode. `precision` in characters, clamped to [1, 12].
    */
  def geohashEncode(lon: Double, lat: Double, precision: Int): UTF8String = {
    val p = math.max(1, math.min(12, precision))
    val sb = new java.lang.StringBuilder(p)
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    var ch = 0
    var bit = 0
    while (sb.length < p) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Cell-center decode: (lon, lat) of the geohash cell's midpoint. */
  def geohashDecode(hash: UTF8String): Array[Double] = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    val s = hash.toString.toLowerCase
    var i = 0
    while (i < s.length) {
      val cd = Base32.indexOf(s.charAt(i))
      require(cd >= 0, s"invalid geohash character '${s.charAt(i)}' in '$s'")
      var b = 4
      while (b >= 0) {
        val bitSet = ((cd >> b) & 1) == 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (bitSet) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bitSet) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    Array((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** `greatCircleDistance(lon1, lat1, lon2, lat2)` → meters (haversine on
  * the IUGG mean sphere). `geoDistance` is registered as an alias — the
  * ClickHouse original applies an ellipsoidal correction; the divergence
  * (<0.5% of the distance) is documented at the registration site.
  */
case class GreatCircleDistance(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "great_circle_distance"

  protected override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoOps.greatCircle(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"org.apache.spark.sql.graft.GeoOps.greatCircle($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** `pointInPolygon(x, y, xs, ys)` — ray casting, boundary = inside.
  * ClickHouse spells the polygon as an array of tuples; tuple-array
  * literals don't round-trip through this SQL dialect, so the polygon
  * rides as parallel coordinate arrays (the same adaptation the funnel
  * family makes for parametric aggregates).
  */
case class PointInPolygon(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_in_polygon"

  protected override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoOps.pointInPolygon(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"org.apache.spark.sql.graft.GeoOps.pointInPolygon($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** `geohashEncode(lon, lat[, precision=12])` → base32 geohash string. */
case class GeohashEncode(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_encode"

  protected override def nullSafeEval(lon: Any, lat: Any, p: Any): Any =
    GeoOps.geohashEncode(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      p.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"org.apache.spark.sql.graft.GeoOps.geohashEncode($a, $b, $c)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `geohashDecode(str)` → struct(longitude, latitude) of the cell center
  * (ClickHouse returns the tuple (longitude, latitude)).
  */
case class GeohashDecode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("longitude", DoubleType, nullable = false),
    StructField("latitude", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash_decode"

  protected override def nullSafeEval(v: Any): Any = {
    val ll = GeoOps.geohashDecode(v.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.InternalRow(ll(0), ll(1))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
