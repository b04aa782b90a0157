package graft.traffic

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.GraftSession

/** Golden e2e support: the full batch pipeline (QuickFetch-sized 1000-row
  * fixture → Normalize → analysis battery) rendered to canonical CSV —
  * the executable replacement for the reference's SC screenshot goldens.
  *
  * `GoldenTool.analyses` defines the battery; `main` regenerates the
  * checked-in CSVs under src/test/resources/goldens (run via
  * `sbt "Test/runMain graft.traffic.GoldenTool"` after an INTENTIONAL
  * semantic change); GoldenSpec compares against them.
  */
object GoldenTool {

  def analyses(norm: DataFrame): Seq[(String, DataFrame)] = Seq(
    "busiest_streets" -> TrafficAnalytics.busiestStreets(norm),
    "traffic_by_date" -> TrafficAnalytics.trafficByDate(norm),
    "busiest_dates" -> TrafficAnalytics.busiestDates(norm),
    "peak_hours" -> TrafficAnalytics.peakHours(norm),
    "directional" -> TrafficAnalytics.directionalTraffic(norm),
    "boroughs" -> TrafficAnalytics.boroughTraffic(norm),
    "correlation" -> TrafficAnalytics.correlationMatrix(norm,
      Seq("volume", "hour", "day_of_week", "is_weekend")))

  /** Canonical CSV: header + rows, fixed formatting, deterministic order
    * (every analysis already carries a total ORDER BY). */
  def toCsv(df: DataFrame): String = {
    val header = df.columns.mkString(",")
    val rows = df.collect().map(_.toSeq.map {
      case null => ""
      case d: Double => f"$d%.6f"
      case v => v.toString
    }.mkString(","))
    (header +: rows).mkString("\n") + "\n"
  }

  val goldenDir = "src/test/resources/goldens"

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val norm = Normalize(TrafficFixture.raw(spark, 1000))
    Files.createDirectories(Paths.get(goldenDir))
    analyses(norm).foreach { case (name, df) =>
      Files.write(Paths.get(s"$goldenDir/$name.csv"),
        toCsv(df).getBytes(StandardCharsets.UTF_8))
      println(s"wrote $goldenDir/$name.csv")
    }
    spark.stop()
  }
}
