package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.Epsg2263ToWgs84

/** Geospatial column functions for the traffic surface (SURVEY.md F60-F62):
  * WKT POINT parsing as a regexp composition (no UDF — Catalyst sees
  * through it) and the EPSG:2263→WGS84 reprojection expression. */
object GeoFunctions {

  private val PointRe = "^\\s*POINT\\s*\\(\\s*(-?[0-9.]+)\\s+(-?[0-9.]+)\\s*\\)\\s*$"

  /** X (first) coordinate of a WKT `POINT (x y)`; malformed → null —
    * matching the reference's try/except → (None, None) (`Dash.py:14-23`). */
  def wktPointX(wkt: Column): Column =
    nullIfEmpty(regexp_extract(wkt, PointRe, 1)).cast("double")

  /** Y (second) coordinate of a WKT `POINT (x y)`; malformed → null. */
  def wktPointY(wkt: Column): Column =
    nullIfEmpty(regexp_extract(wkt, PointRe, 2)).cast("double")

  private def nullIfEmpty(c: Column): Column =
    when(c === "", lit(null)).otherwise(c)

  /** EPSG:2263 state-plane feet → WGS84 longitude (degrees). */
  def lonFromStatePlane(x: Column, y: Column): Column =
    element_at(Epsg2263ToWgs84.toWgs84(x, y), 1)

  /** EPSG:2263 state-plane feet → WGS84 latitude (degrees). */
  def latFromStatePlane(x: Column, y: Column): Column =
    element_at(Epsg2263ToWgs84.toWgs84(x, y), 2)
}
