package graft.traffic

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed facade over the normalized long traffic table (SURVEY.md §1.1):
  * `DataFrame` stays the core abstraction (runtime schemas), but the
  * canonical 19-column shape gets a case-class view where compile-time
  * field checks pay off. All fields optional — normalization is lenient
  * by design. */
case class TrafficRecord(
    request_id: Option[String],
    borough: Option[String],
    year: Option[Long],
    month: Option[Int],
    day: Option[Long],
    hour: Option[Long],
    minute: Option[Long],
    volume: Option[Long],
    segment_id: Option[Long],
    street: Option[String],
    fromst: Option[String],
    tost: Option[String],
    direction: Option[String],
    direction_code: Option[Int],
    date: Option[java.sql.Date],
    day_of_week: Option[Int],
    is_weekend: Option[Int],
    week_of_year: Option[Int],
    x_coord: Option[Double],
    y_coord: Option[Double])

object TrafficRecord {
  /** Normalized DataFrame → typed Dataset (column order independent). */
  def typed(normalized: DataFrame)(implicit spark: SparkSession): Dataset[TrafficRecord] = {
    import spark.implicits._
    val cols = Seq("request_id", "borough", "year", "month", "day", "hour",
      "minute", "volume", "segment_id", "street", "fromst", "tost",
      "direction", "direction_code", "date", "day_of_week", "is_weekend",
      "week_of_year", "x_coord", "y_coord")
    normalized.select(cols.map(col): _*).as[TrafficRecord]
  }
}
