package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Wave-11 operators: CUSUM drift, last-touch attribution, session
  * co-occurrence lift. */
class Wave11Spec extends SparkSpec {
  import spark.implicits._

  test("cusumDrift: closed form equals the recursion; flags only the shifted run") {
    // 20 baseline days at 10 events, then 10 elevated days at 16.
    val counts = Seq.fill(20)(10) ++ Seq.fill(10)(16)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i =>
        ("x", Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:${i % 60}%02d")))
    }
    val df = rows.toDF("k", "ts")
    val out = Funnel.cusumDrift(df, col("k"), col("ts"))
      .orderBy("day").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))
    assert(out.length == 30)
    val (mu, sigma) = (out.head._2, out.head._3)
    val k = BigDecimal(sigma * 0.5)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h = BigDecimal(sigma * 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // reference recursion s_t = max(0, s + (n - mu - k))
    var s = 0.0
    counts.zip(out).foreach { case (n, (nGot, _, _, cusum, drift)) =>
      assert(nGot == n.toLong)
      s = math.max(0.0, s + (n - mu - k))
      assert(math.abs(cusum - s) < 1e-6, s"cusum $cusum vs recursion $s")
      assert(drift == (cusum > h))
    }
    // flags exist, and only inside the elevated run
    val flags = out.map(_._5)
    assert(flags.takeWhile(!_).length >= 20, "flagged during baseline")
    assert(flags.count(identity) >= 1, "sustained shift never flagged")
  }

  test("lastTouchAttribution: window bound, tie-at-ts, and no-touch cases") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: click then purchase 1h later (attributed)
      (1L, t("2024-01-01 10:00:00"), "click", 0.0),
      (1L, t("2024-01-01 11:00:00"), "purchase", 100.0),
      // user 1: second purchase 30h after the click (NOT attributed)
      (1L, t("2024-01-02 16:00:00"), "purchase", 50.0),
      // user 2: purchase with no click ever (NOT attributed)
      (2L, t("2024-01-01 12:00:00"), "purchase", 70.0),
      // user 3: click at exactly the purchase ts (attributed - tie rule)
      (3L, t("2024-01-03 09:00:00"), "click", 0.0),
      (3L, t("2024-01-03 09:00:00"), "purchase", 30.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Funnel.lastTouchAttribution(events, col("user_id"), col("ts"),
        col("event_type"), col("value"), "click", "purchase",
        windowMicros = 24L * 3600L * 1000000L)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("2024-01-01") == ((2L, 1L, 100.0)))
    assert(got("2024-01-02") == ((1L, 0L, 0.0)))
    assert(got("2024-01-03") == ((1L, 1L, 30.0)))
  }

  test("sessionCooccurrence: exact lift on planted sessions") {
    def t(s: String) = Timestamp.valueOf(s)
    // four users, one session each: {A,B}, {A,B}, {A}, {B,C}
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), "A"), (1L, t("2024-01-01 10:01:00"), "B"),
      (2L, t("2024-01-01 10:00:00"), "A"), (2L, t("2024-01-01 10:01:00"), "B"),
      (3L, t("2024-01-01 10:00:00"), "A"),
      (4L, t("2024-01-01 10:00:00"), "B"), (4L, t("2024-01-01 10:01:00"), "C")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.sessionCooccurrence(events, col("user_id"), col("ts"),
        col("event_type"), gapMicros = 30L * 60L * 1000000L, topN = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // S=4, n_A=3, n_B=3, n_C=1
    assert(got(("A", "B")) == ((2L, 3L, 3L, round4(2.0 * 4 / 9))))
    assert(got(("B", "C")) == ((1L, 3L, 1L, round4(1.0 * 4 / 3))))
    assert(got.size == 2)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
}
