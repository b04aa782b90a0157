package graft

import org.apache.spark.sql.functions._

import graft.expressions.Epsg2263ToWgs84
import graft.functions.GeoFunctions

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("EPSG:2263 anchor: false origin maps to exactly (-74, 40°10')") {
    val (lon, lat) = Epsg2263ToWgs84.inverse(984250.0, 0.0)
    assert(math.abs(lon - -74.0) < 1e-9)
    assert(math.abs(lat - (40.0 + 10.0 / 60.0)) < 1e-9)
  }

  test("EPSG:2263 forward/inverse round-trip at double precision") {
    for ((lon, lat) <- Seq((-74.006, 40.7128), (-73.95, 40.744),
                           (-73.7, 40.6), (-74.25, 40.5), (-73.97, 41.0))) {
      val (x, y) = Epsg2263ToWgs84.forward(lon, lat)
      val (lon2, lat2) = Epsg2263ToWgs84.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-10, s"lon roundtrip $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-10, s"lat roundtrip $lat -> $lat2")
    }
  }

  test("EPSG:2263 landmark sanity: Pulaski Bridge (reference WKT sample)") {
    // POINT (997407.0998 208620.9261) — Pulaski Bridge, ~(40.744, -73.954)
    val (lon, lat) = Epsg2263ToWgs84.inverse(997407.0998, 208620.9261)
    assert(math.abs(lat - 40.744) < 0.01, s"lat=$lat")
    assert(math.abs(lon - -73.954) < 0.01, s"lon=$lon")
  }

  test("EPSG:2263 scale sanity: one degree of latitude ≈ 364k survey feet") {
    val (_, y0) = Epsg2263ToWgs84.forward(-74.0, 40.5)
    val (_, y1) = Epsg2263ToWgs84.forward(-74.0, 41.5)
    assert(math.abs((y1 - y0) - 364300) < 1500, s"dy=${y1 - y0}")
  }

  test("expression is null-safe: null/NaN inputs -> null") {
    val df = Seq((Some(1.0), Some(Double.NaN)), (None, Some(2.0)))
      .toDF("x", "y")
    val got = df.select(Epsg2263ToWgs84.toWgs84(col("x"), col("y"))).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("WKT parse handles whitespace, negatives; rejects non-POINT") {
    val df = Seq("POINT (1.5 -2.25)", "  POINT ( -3 4 ) ", "LINESTRING (0 0, 1 1)",
      "", "POINT(5 6)").toDF("w")
    val got = df.select(GeoFunctions.wktPointX(col("w")),
        GeoFunctions.wktPointY(col("w"))).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(got(0) == (Some(1.5), Some(-2.25)))
    assert(got(1) == (Some(-3.0), Some(4.0)))
    assert(got(2) == (None, None))
    assert(got(3) == (None, None))
    assert(got(4) == (Some(5.0), Some(6.0)))
  }
}
