package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** EPSG:2263 (NAD83 / New York Long Island, US survey feet) → WGS84
  * lon/lat: the one genuinely custom scalar the reference needs
  * (`Dash.py:133-139` does this via pyproj; SURVEY.md F62).
  *
  * Pure Lambert Conformal Conic 2SP inverse math (Snyder, "Map
  * Projections — A Working Manual", USGS PP 1395, eqs. 14-15..15-5),
  * parameters from the public EPSG registry entry 2263:
  * GRS80 ellipsoid, standard parallels 41°02′/40°40′N, false origin
  * 40°10′N 74°W, false easting 300000.0006096012 m, US survey foot.
  * (NAD83→WGS84 datum shift is identity to well below coordinate noise.)
  *
  * Returns `array<double> [lon, lat]`; null on null/non-finite input.
  * Deterministic & null-safe → Catalyst can fold/prune through it.
  */
case class Epsg2263ToWgs84(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "epsg2263_to_wgs84"

  override def nullSafeEval(xAny: Any, yAny: Any): Any = {
    val x = xAny.asInstanceOf[Double]
    val y = yAny.asInstanceOf[Double]
    if (x.isNaN || y.isNaN || x.isInfinite || y.isInfinite) null
    else {
      val (lon, lat) = Epsg2263ToWgs84.inverse(x, y)
      new GenericArrayData(Array(lon, lat))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Epsg2263ToWgs84 =
    copy(left = newLeft, right = newRight)
}

object Epsg2263ToWgs84 {
  // GRS80 ellipsoid
  private val A = 6378137.0
  private val InvF = 298.257222101
  private val F = 1.0 / InvF
  private val E2 = 2 * F - F * F
  private val E = math.sqrt(E2)

  // EPSG:2263 projection parameters (degrees → radians)
  private val Lat1 = math.toRadians(41.0 + 2.0 / 60.0)   // 41°02'N
  private val Lat2 = math.toRadians(40.0 + 40.0 / 60.0)  // 40°40'N
  private val Lat0 = math.toRadians(40.0 + 10.0 / 60.0)  // 40°10'N
  private val Lon0 = math.toRadians(-74.0)
  /** False easting/northing in the projection's native unit (US survey
    * feet, per the EPSG registry: 984250 ftUS exactly — subtracted in
    * feet BEFORE unit conversion so the origin is exact). */
  private val FalseEastingFt = 984250.0
  private val FalseNorthingFt = 0.0
  /** US survey foot in meters (exactly 1200/3937). */
  val UsFootM: Double = 1200.0 / 3937.0

  private def m(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - E2 * s * s)
  }
  private def t(phi: Double): Double = {
    val s = math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - E * s) / (1 + E * s), E / 2)
  }

  private val N = (math.log(m(Lat1)) - math.log(m(Lat2))) /
    (math.log(t(Lat1)) - math.log(t(Lat2)))
  private val BigF = m(Lat1) / (N * math.pow(t(Lat1), N))
  private val Rho0 = A * BigF * math.pow(t(Lat0), N)

  /** Inverse: (x, y) in EPSG:2263 US survey feet → (lonDeg, latDeg). */
  def inverse(xFt: Double, yFt: Double): (Double, Double) = {
    val x = (xFt - FalseEastingFt) * UsFootM
    val y = (yFt - FalseNorthingFt) * UsFootM
    val rho = math.copySign(math.hypot(x, Rho0 - y), N)
    val tp = math.pow(rho / (A * BigF), 1.0 / N)
    val theta = math.atan2(x, Rho0 - y)
    val lon = theta / N + Lon0
    // Fixed-point iteration for phi (converges quadratically; 8 iters is
    // far past double precision for |lat| < 80°).
    var phi = math.Pi / 2 - 2 * math.atan(tp)
    var i = 0
    while (i < 8) {
      val s = math.sin(phi)
      phi = math.Pi / 2 - 2 * math.atan(
        tp * math.pow((1 - E * s) / (1 + E * s), E / 2))
      i += 1
    }
    (math.toDegrees(lon), math.toDegrees(phi))
  }

  /** Forward: (lonDeg, latDeg) → (x, y) in US survey feet. Used by tests
    * to pin the inverse via round-trip. */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val lon = math.toRadians(lonDeg)
    val lat = math.toRadians(latDeg)
    val rho = A * BigF * math.pow(t(lat), N)
    val theta = N * (lon - Lon0)
    val x = rho * math.sin(theta)
    val y = Rho0 - rho * math.cos(theta)
    (x / UsFootM + FalseEastingFt, y / UsFootM + FalseNorthingFt)
  }

  /** Column API: returns `array(lon, lat)`. */
  def toWgs84(x: Column, y: Column): Column =
    GraftBridge.column(Epsg2263ToWgs84(
      GraftBridge.expression(x.cast("double")),
      GraftBridge.expression(y.cast("double"))))
}
