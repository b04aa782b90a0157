package graft.traffic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wide hourly-table module: the prototype pipeline's shape
  * (`proto/TrafficAnalysis_Hist.py`; SURVEY.md §2.D31-D33, G67, F63-F65) —
  * one row per (roadway, date, direction) with 24 hourly-volume columns,
  * unpivoted to long form for analytics/modeling.
  */
object WideTable {

  /** F65: hourly-volume columns by the reference's am/pm name convention
    * (`proto:209,246,300` matches substring 'AM'/'PM'; we anchor to the
    * suffix so metadata names like `roadway_name` — which contains "am" —
    * can't collide). Driver-side schema introspection — no data scan. */
  def hourColumns(df: DataFrame): Seq[String] =
    df.columns.filter { c =>
      val l = c.toLowerCase
      l.endsWith("am") || l.endsWith("pm")
    }.toSeq

  /** F63/F64: hour-of-day (0-23) from a wide column name like
    * `_12_00_1_00_am` — leading hour number + trailing am/pm token,
    * 12am→0, 12pm→12. */
  def hourOfDayFromName(name: Column): Column = {
    val num = regexp_extract(name, "(\\d{1,2})_", 1).cast("int")
    val isPm = lower(name).rlike("pm$")
    val h12 = when(num === 12, 0).otherwise(num)
    when(isPm, h12 + 12).otherwise(h12)
  }

  /** G67: unpivot the 24 hourly columns to long
    * (`idCols..., time, traffic_volume, hour_of_day`). */
  def unpivotHours(df: DataFrame, idCols: Seq[String]): DataFrame = {
    val hours = hourColumns(df)
    df.unpivot(
        idCols.map(col).toArray,
        hours.map(col).toArray,
        "time", "traffic_volume")
      .withColumn("hour_of_day", hourOfDayFromName(col("time")))
  }

  /** D31: group-sum all hourly columns at once. */
  def groupSumWide(df: DataFrame, key: String): DataFrame = {
    val hours = hourColumns(df)
    df.groupBy(col(key))
      .agg(sum(col(hours.head)).as(hours.head),
        hours.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** D32: horizontal (row-wise) total of the hourly columns — expression
    * fold, no shuffle. */
  def rowTotal(df: DataFrame, as: String = "total_traffic"): DataFrame =
    df.withColumn(as,
      hourColumns(df).map(c => coalesce(col(c), lit(0L))).reduce(_ + _))

  /** D33: peak hour per street — the reference's one window-shaped
    * computation (`idxmax(axis=1)`, `proto:209-210`). Aggregate FIRST
    * (24 sums per street), unpivot the tiny aggregate, then rank: the
    * window only ever sees |streets|·24 rows, never raw data — the
    * at-scale version of a pandas row-wise argmax. Ties break on earlier
    * hour (deterministic; pandas idxmax keeps first). */
  def peakHourPerKey(df: DataFrame, key: String): DataFrame = {
    val sums = groupSumWide(df, key)
    val long = unpivotHours(sums, Seq(key))
    val w = Window.partitionBy(col(key))
      .orderBy(desc("traffic_volume"), asc("hour_of_day"))
    long.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(key), col("time").as("peak_hour"),
        col("hour_of_day").as("peak_hour_of_day"),
        col("traffic_volume").as("peak_volume"))
  }

  /** Wide-table normalize (the prototype's `process_data`, proto:55-90):
    * lenient coercion of the hourly columns (B12), date cast with missing
    * dates defaulting to 1970-01-01 (B14/F58), hourly nulls filled with 0
    * (F57), then the ≥50%-non-null completeness filter (C18). Order
    * matters: the completeness filter must see pre-fill nulls — pandas
    * applies fillna only to the traffic columns before dropna(thresh), so
    * the thresh counts post-fill values; we mirror that exactly. */
  def normalizeWide(df: DataFrame): DataFrame = {
    val hours = hourColumns(df)
    val coerced = hours.foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c).cast("string").try_cast("double").try_cast("long"))
    }
    val dated =
      if (!df.columns.contains("date")) coerced
      else coerced.withColumn("date",
        coalesce(col("date").try_cast("date"),
          lit(java.sql.Date.valueOf("1970-01-01"))))
    val filled = dated.na.fill(0L, hours)
    filled.na.drop(minNonNulls = df.columns.length / 2)
  }

  /** D42: fixed-width histogram of one column — min/max in one pass, then
    * a single groupBy on the computed bucket. The bucket formula (floor of
    * one double expression) is deterministic and shuffle-friendly. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    val stats = df.agg(min(col(c)).as("__min"), max(col(c)).as("__max"))
    df.crossJoin(broadcast(stats))
      .where(col(c).isNotNull)
      .withColumn("bucket",
        when(col("__max") === col("__min"), 0)
          .otherwise(least(lit(bins - 1),
            floor((col(c) - col("__min")) * bins / (col("__max") - col("__min")))))
          .cast("int"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }
}
