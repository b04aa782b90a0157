package graft.traffic

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WideTableSpec extends SparkSpec {
  import spark.implicits._

  // Miniature wide table: 3 hourly columns stand in for the 24.
  private lazy val wide = Seq(
    ("BROADWAY", "2024-01-01", 10L, 20L, 30L),
    ("BROADWAY", "2024-01-02", 5L, 45L, 1L),
    ("FDR DR", "2024-01-01", 7L, 7L, 2L))
    .toDF("roadway_name", "date", "_12_00_1_00_am", "_1_00_2_00pm", "_11_00_12_00pm")

  test("hourColumns finds am/pm columns by substring (F65)") {
    assert(WideTable.hourColumns(wide) ==
      Seq("_12_00_1_00_am", "_1_00_2_00pm", "_11_00_12_00pm"))
  }

  test("hourOfDayFromName: 12am->0, 1pm->13, 11pm->23 (F63/F64)") {
    val got = Seq("_12_00_1_00_am", "_1_00_2_00pm", "_11_00_12_00pm", "_9_00_10_00_am")
      .toDF("n").select(WideTable.hourOfDayFromName(col("n")))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(0, 13, 23, 9))
  }

  test("unpivotHours produces long rows (G67)") {
    val long = WideTable.unpivotHours(wide, Seq("roadway_name", "date"))
    assert(long.count() == 9)
    assert(long.columns.toSeq ==
      Seq("roadway_name", "date", "time", "traffic_volume", "hour_of_day"))
  }

  test("groupSumWide sums all hourly columns at once (D31)") {
    val got = WideTable.groupSumWide(wide, "roadway_name")
      .filter(col("roadway_name") === "BROADWAY").collect().head
    assert(got.getAs[Long]("_12_00_1_00_am") == 15L)
    assert(got.getAs[Long]("_1_00_2_00pm") == 65L)
  }

  test("rowTotal is the horizontal sum, null-safe (D32)") {
    val withNull = Seq(("X", Option(1L), Option.empty[Long], Option(2L)))
      .toDF("roadway_name", "_1_00_2_00_am", "_2_00_3_00_am", "_3_00_4_00_am")
    assert(WideTable.rowTotal(withNull).collect().head
      .getAs[Long]("total_traffic") == 3L)
  }

  test("peakHourPerKey: argmax over aggregated hours, first-hour ties (D33)") {
    val got = WideTable.peakHourPerKey(wide, "roadway_name")
      .collect().map(r => r.getString(0) -> (r.getAs[String]("peak_hour"),
        r.getAs[Long]("peak_volume"))).toMap
    assert(got("BROADWAY") == ("_1_00_2_00pm", 65L))
    // FDR DR ties 7,7 on the two first cols -> earlier hour-of-day wins (0)
    assert(got("FDR DR") == ("_12_00_1_00_am", 7L))
  }

  test("normalizeWide: coercion, fillna 0, default date, completeness filter") {
    val raw = Seq(
      ("A", "2024-01-05", "10", "junk", "30"),    // junk -> null -> filled 0
      ("B", null, "1", "2", "3"),                  // missing date -> 1970-01-01
      (null, null, null, null, "7"))               // 1/5 non-null pre-fill... filled hours count
      .toDF("roadway_name", "date", "_1_00_2_00_am", "_2_00_3_00_am", "_3_00_4_00_am")
    val got = WideTable.normalizeWide(raw).collect()
    val byName = got.map(r => Option(r.getAs[String]("roadway_name"))).toSet
    val a = got.find(_.getAs[String]("roadway_name") == "A").get
    assert(a.getAs[Long]("_2_00_3_00_am") == 0L) // junk coerced then filled
    val b = got.find(_.getAs[String]("roadway_name") == "B").get
    assert(b.getAs[java.sql.Date]("date").toString == "1970-01-01")
    assert(byName.contains(Some("A")) && byName.contains(Some("B")))
  }

  test("histogram: fixed-width buckets with max value clamped (D42)") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = WideTable.histogram(df, "v", 10).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("n")).toMap
    assert(h.keySet == (0 to 9).toSet)
    assert(h(0) == 10 && h(9) == 11) // 100 clamps into last bucket
    assert(h.values.sum == 101)
  }
}
