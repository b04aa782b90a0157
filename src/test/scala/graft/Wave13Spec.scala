package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Funnel}

/** Wave-13 operators: per-key daily trend lines, calendar-aligned
  * seasonal autocorrelation, source-concentration Gini. */
class Wave13Spec extends SparkSpec {
  import spark.implicits._

  private def dayEvents(key: String, counts: Seq[Int],
      startDay: Int = 1): Seq[(String, Timestamp)] =
    counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i =>
        (key, Timestamp.valueOf(
          f"2024-03-${startDay + d}%02d 00:00:" + f"${i % 60}%02d")))
    }

  test("dailyTrend: exact fit on a perfect line; flat series reports r2 null") {
    val df = (dayEvents("line", Seq(2, 4, 6, 8)) ++
      dayEvents("flat", Seq(5, 5, 5))).toDF("k", "ts")
    val got = Funnel.dailyTrend(df, col("k"), col("ts"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDate(2).toString, r.getDate(3).toString,
          r.getDouble(4), r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(got("line") ==
      ((4L, "2024-03-01", "2024-03-04", 2.0, 0.0, Some(1.0))))
    val (n, _, _, slope, intercept, r2) = got("flat")
    assert(n == 3L && slope == 0.0 && intercept == 5.0 && r2.isEmpty)
  }

  test("dailyTrend: single observed day is dropped (no fit from one point)") {
    val df = dayEvents("one", Seq(3)).toDF("k", "ts")
    assert(Funnel.dailyTrend(df, col("k"), col("ts")).count() == 0)
  }

  test("seasonalAutocorr: periodic series scores 1; calendar gap drops its pair") {
    val week = Seq(1, 2, 3, 4, 5, 6, 7)
    // two identical weeks, but day 9 (index 8) removed: its (t, t-7)
    // pair must vanish instead of shifting the alignment
    val twoWeeks = dayEvents("p", week ++ week).toDF("k", "ts")
      .filter(!(col("ts") >= lit(Timestamp.valueOf("2024-03-09 00:00:00")) &&
        col("ts") < lit(Timestamp.valueOf("2024-03-10 00:00:00"))))
    val got = Funnel.seasonalAutocorr(twoWeeks, col("k"), col("ts"), 7)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq((6L, Some(1.0))))
  }

  test("seasonalAutocorr: zero variance on one side reports null") {
    val df = dayEvents("z", Seq(1, 2, 3) ++ Seq(4, 4, 4), startDay = 1)
      .toDF("k", "ts")
    val got = Funnel.seasonalAutocorr(df, col("k"), col("ts"), 3)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq((3L, None)))
  }

  test("sourceConcentration: rank-form Gini on planted masses") {
    val docs = Seq(
      // lang a: masses 1, 1, 2 (unit s2 built from TWO rows)
      ("a", "s1", 1L), ("a", "s2", 1L), ("a", "s3", 1L), ("a", "s3", 1L),
      // lang b: perfectly even
      ("b", "s1", 5L), ("b", "s2", 5L),
      // lang c: a single source is (degenerately) even
      ("c", "s1", 9L)
    ).toDF("lang", "source", "n_chars")
    val got = CorpusStats.sourceConcentration(docs, col("lang"),
        col("source"), col("n_chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a") == ((3L, 4L, 0.1667)))
    assert(got("b") == ((2L, 10L, 0.0)))
    assert(got("c") == ((1L, 9L, 0.0)))
  }
}
