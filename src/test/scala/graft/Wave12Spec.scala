package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Funnel}

/** Wave-12 operators: referential-integrity audit, SCD2 change
  * intervals, truncated-EWMA deviation screen. */
class Wave12Spec extends SparkSpec {
  import spark.implicits._

  test("referentialAudit: planted orphans, nulls, and counts are exact") {
    val child = Seq(Option(1L), Option(1L), Option(2L), Option(3L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = CorpusStats.referentialAudit(
        Seq(("child->parent", child, col("ck"), parent, col("pk"))))
      .collect().head
    assert(r.getString(0) == "child->parent")
    assert(r.getLong(1) == 5L, "n_rows")
    assert(r.getLong(2) == 1L, "n_null_rows")
    assert(r.getLong(3) == 3L, "n_distinct_keys")
    assert(r.getLong(4) == 1L, "n_orphan_keys")
    assert(r.getLong(5) == 1L, "n_orphan_rows")
    assert(r.getDouble(6) == 0.2d, "orphan_row_share")
  }

  test("referentialAudit: clean constraint measures its zero") {
    val child = Seq(1L, 2L, 2L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = CorpusStats.referentialAudit(
      Seq(("c->p", child, col("ck"), parent, col("pk")))).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getDouble(6)) == ((3L, 0L, 2L, 0L, 0L, 0.0d)))
  }

  test("changeIntervals: last-per-day reduce, observed-day islands, null state") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // day 1: two events — the later one decides the bucket (250 → 2)
      (1L, t("2024-01-01 09:00:00"), Option(10.0), 1L),
      (1L, t("2024-01-01 10:00:00"), Option(250.0), 2L),
      (1L, t("2024-01-02 05:00:00"), Option(260.0), 3L),
      // day 3 silent; day 4 still bucket 2 — same island across the gap
      (1L, t("2024-01-04 08:00:00"), Option(201.0), 4L),
      // day 5: same-ts tie — higher event_id wins (799 → 7)
      (1L, t("2024-01-05 12:00:00"), Option(220.0), 50L),
      (1L, t("2024-01-05 12:00:00"), Option(799.0), 51L),
      // day 6: back to bucket 2 — a NEW interval, not a merge
      (1L, t("2024-01-06 07:00:00"), Option(290.0), 52L),
      // days 7–8: null value — null is a tracked state
      (1L, t("2024-01-07 07:00:00"), None: Option[Double], 53L),
      (1L, t("2024-01-08 07:00:00"), None: Option[Double], 54L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = Funnel.changeIntervals(events, col("user_id"), col("ts"),
        floor(col("value") / 100.0d).cast("long"), col("event_id"))
      .orderBy("valid_from")
      .collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getDate(2).toString, r.getDate(3).toString, r.getLong(4)))
    assert(got.toSeq == Seq(
      (Some(2L), "2024-01-01", "2024-01-04", 3L),
      (Some(7L), "2024-01-05", "2024-01-05", 1L),
      (Some(2L), "2024-01-06", "2024-01-06", 1L),
      (None, "2024-01-07", "2024-01-08", 2L)))
  }

  test("ewmaScreen: truncated-EWMA closed form, forecast dev, spike flag") {
    val counts = Seq(10, 10, 10, 10, 20)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i =>
        ("x", Timestamp.valueOf(
          s"2024-02-0${d + 1} 00:00:" + f"${i % 60}%02d")))
    }
    val df = rows.toDF("k", "ts")
    val got = Funnel.ewmaScreen(df, col("k"), col("ts"),
        decay = 0.5, span = 3, hSigma = 1.0)
      .orderBy("day").collect()
    assert(got.length == 5)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // reference: the truncated-window closed form, independently
    def ewma(t: Int): Double = {
      val lo = math.max(0, t - 2)
      val terms = (lo to t).map(j => math.pow(0.5, t - j) -> counts(j))
      round4(terms.map { case (w, n) => w * n }.sum / terms.map(_._1).sum)
    }
    val sigma = got.head.getDouble(3)
    got.zipWithIndex.foreach { case (r, t) =>
      assert(r.getLong(2) == counts(t).toLong)
      assert(r.getDouble(4) == ewma(t), s"ewma at $t")
      if (t == 0) { assert(r.isNullAt(5)); assert(!r.getBoolean(6)) }
      else {
        val dev = round4(counts(t) - ewma(t - 1))
        assert(r.getDouble(5) == dev, s"dev at $t")
        assert(r.getBoolean(6) == (math.abs(dev) > round4(sigma * 1.0)))
      }
    }
    // the jump day is flagged; the steady days and the no-forecast day are not
    assert(got.map(_.getBoolean(6)).toSeq ==
      Seq(false, false, false, false, true))
  }
}
