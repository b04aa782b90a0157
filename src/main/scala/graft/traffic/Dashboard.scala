package graft.traffic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The dashboard's six figure queries (`Dash.update_graphs`,
  * `Dash.py:148-252`; SURVEY.md §3.2) bundled over one snapshot frame —
  * each consumer re-runs these per UI tick against the immutable
  * published snapshot ([[graft.streaming.SnapshotRefresh.SnapshotStore]]),
  * which removes the reference's reader/writer race by construction.
  *
  * Expects the dashboard-variant normalized frame
  * ([[Dashboard.prepare]]): long table + `datetime` + WGS84 lat/lon.
  */
object Dashboard {

  /** Dash.py's `fetch_and_process_data`: normalize + timestamp + lat/lon
    * (reprojection applied to EVERY snapshot — deliberately fixing the
    * reference bug where only the first snapshot was reprojected,
    * SURVEY.md §7.4.7a). */
  def prepare(raw: DataFrame): DataFrame =
    Normalize.deriveLatLon(Normalize.deriveTimestamp(Normalize(raw)))

  /** Dropdown options (D39). */
  def streetOptions(snapshot: DataFrame): DataFrame =
    snapshot.select(col("street")).where(col("street").isNotNull)
      .distinct().orderBy(asc("street"))

  /** All six figures, keyed as in the reference's callback. */
  def figures(snapshot: DataFrame, selectedStreet: String): Seq[(String, DataFrame)] = Seq(
    "street_time_series" -> TrafficAnalytics.streetTimeSeries(snapshot, selectedStreet),
    "top_streets" -> TrafficAnalytics.topStreets(snapshot),
    "latest_day_hourly" -> TrafficAnalytics.latestDayHourly(snapshot),
    "borough_pie" -> TrafficAnalytics.boroughTraffic(snapshot),
    "borough_bar" -> TrafficAnalytics.boroughTraffic(snapshot),
    "map_points" -> TrafficAnalytics.mapPoints(snapshot))
}
