package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Pins the event-sequence operators: the funnel's strict-ordering
  * semantics (out-of-order events do NOT convert; ties DO) and the
  * retention triangle's cohort/offset arithmetic.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("conversionFunnel: out-of-order events do not convert; ties do") {
    val ev = Seq(
      // u1 converts fully in order
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 11:00:00"), "click"),
      (1L, t("2024-01-01 12:00:00"), "purchase"),
      // u2: purchase BEFORE the first view -> stops at click
      (2L, t("2024-01-02 09:00:00"), "purchase"),
      (2L, t("2024-01-02 10:00:00"), "view"),
      (2L, t("2024-01-02 11:00:00"), "click"),
      // u3: click at EXACTLY the first view's ts -> tie counts
      (3L, t("2024-01-03 10:00:00"), "view"),
      (3L, t("2024-01-03 10:00:00"), "click"),
      // u4: click only, never viewed -> not even step 1
      (4L, t("2024-01-04 10:00:00"), "click"),
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversionFunnel(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1, "view", 3L, 1.0),       // u1, u2, u3
      (2, "click", 3L, 1.0),      // all three clicked at/after first view
      (3, "purchase", 1L, 0.3333) // only u1's purchase is in order
    ))
  }

  test("anyTouchFunnel: recovers the conversion first-touch writes off") {
    val hour = 3600L * 1000000L
    val ev = Seq(
      // u1: purchase fits only the SECOND click's 1h window — the
      // first-touch anchor (click 10:00) expires at 11:00, so q104's
      // convention stops at step 2; any-touch converts.
      (1L, 1L, t("2024-01-01 10:00:00"), "view"),
      (1L, 2L, t("2024-01-01 10:00:30"), "click"),
      (1L, 3L, t("2024-01-01 10:59:00"), "click"),
      (1L, 4L, t("2024-01-01 11:30:00"), "purchase"),
      // u2: converts within first-touch windows too — both agree.
      (2L, 5L, t("2024-01-02 09:00:00"), "view"),
      (2L, 6L, t("2024-01-02 09:10:00"), "click"),
      (2L, 7L, t("2024-01-02 09:20:00"), "purchase"),
      // u3: purchase beyond every click's window — neither converts.
      (3L, 8L, t("2024-01-03 09:00:00"), "view"),
      (3L, 9L, t("2024-01-03 09:10:00"), "click"),
      (3L, 10L, t("2024-01-03 11:00:00"), "purchase"),
    ).toDF("user_id", "event_id", "ts", "event_type")
    val first = Funnel.conversionFunnel(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"),
        maxGapMicros = Some(hour))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    val any = Funnel.anyTouchFunnel(ev, col("user_id"), col("ts"),
        col("event_type"), col("event_id"),
        Seq("view", "click", "purchase"), gapMicros = hour,
        maxEventsPerUserType = 100)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(first.toSeq == Seq((1, 3L), (2, 3L), (3, 1L))) // only u2
    assert(any.toSeq == Seq((1, 3L), (2, 3L), (3, 2L)))   // u1 AND u2
    // Any-touch dominates first-touch per step by construction.
    assert(first.zip(any).forall { case ((_, f), (_, a)) => a >= f })
  }

  test("anyTouchFunnel: the per-user event cap is earliest-K and one-sided") {
    val hour = 3600L * 1000000L
    // u1's FIRST 2 clicks are both stale for the purchase; the third
    // (in-window) click is beyond cap=2 — the conversion is MISSED
    // (never invented): the documented one-sided cap contract.
    val ev = Seq(
      (1L, 1L, t("2024-01-01 08:00:00"), "view"),
      (1L, 2L, t("2024-01-01 08:00:10"), "click"),
      (1L, 3L, t("2024-01-01 08:00:20"), "click"),
      (1L, 4L, t("2024-01-01 08:50:00"), "click"),
      (1L, 5L, t("2024-01-01 09:30:00"), "purchase"),
    ).toDF("user_id", "event_id", "ts", "event_type")
    def run(cap: Int) = Funnel.anyTouchFunnel(ev, col("user_id"),
        col("ts"), col("event_type"), col("event_id"),
        Seq("view", "click", "purchase"), gapMicros = hour,
        maxEventsPerUserType = cap)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(run(2) == Seq((1, 1L), (2, 1L), (3, 0L)))
    assert(run(3) == Seq((1, 1L), (2, 1L), (3, 1L)))
  }

  test("conversionFunnel: a user's earliest qualifying event anchors the next step") {
    // u1's first view is 10:00; the 09:00 click is stale but the 10:30
    // click qualifies — min(qualifying), not min(all).
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 09:00:00"), "click"),
      (1L, t("2024-01-01 10:30:00"), "click"),
      (1L, t("2024-01-01 10:15:00"), "purchase"), // before qualifying click
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversionFunnel(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L), (2, 1L), (3, 0L)))
  }

  test("conversionFunnel: empty first step yields zero rows with null rates") {
    val ev = Seq((1L, t("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.conversionFunnel(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click")).orderBy("step").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(got.forall(_.isNullAt(3)))
  }

  test("conversionFunnel with maxGap: window enforced, first-touch anchoring") {
    val hour = 3600L * 1000000L
    val ev = Seq(
      // u1 converts within the 1h window
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:30:00"), "click"),
      // u2's click is 2h after the view -> out of window
      (2L, t("2024-01-02 10:00:00"), "view"),
      (2L, t("2024-01-02 12:00:00"), "click"),
      // u3: first-touch semantics — the anchor is the EARLIEST view
      // (09:00), so the 10:30 click misses the window even though the
      // 10:00 view would have caught it
      (3L, t("2024-01-03 09:00:00"), "view"),
      (3L, t("2024-01-03 10:00:00"), "view"),
      (3L, t("2024-01-03 10:30:00"), "click"),
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversionFunnel(ev, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click"),
        maxGapMicros = Some(hour))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 3L), (2, 1L)))
  }

  test("topPaths: consecutive per-user trigrams, never spanning users") {
    val ev = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), "a"),
      (1L, 2L, t("2024-01-01 11:00:00"), "b"),
      (1L, 3L, t("2024-01-01 12:00:00"), "c"),
      (1L, 4L, t("2024-01-01 13:00:00"), "a"),
      (2L, 5L, t("2024-01-01 10:00:00"), "b"),
      (2L, 6L, t("2024-01-01 11:00:00"), "c"),
      (2L, 7L, t("2024-01-01 12:00:00"), "a"),
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Funnel.topPaths(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // u1: a>b>c, b>c>a ; u2: b>c>a — never a path crossing into u2.
    assert(got == Seq(("b>c>a", 2L), ("a>b>c", 1L)))
  }

  test("topPaths: equal-timestamp order resolved by the tie-break column") {
    val ev = Seq(
      (1L, 2L, t("2024-01-01 10:00:00"), "b"),
      (1L, 1L, t("2024-01-01 10:00:00"), "a"),
      (1L, 3L, t("2024-01-01 10:00:00"), "c"),
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Funnel.topPaths(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 3, k = 5)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a>b>c"))
  }

  test("transitionMatrix: hand-computed counts and row probabilities") {
    val ev = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), "a"),
      (1L, 2L, t("2024-01-01 11:00:00"), "b"),
      (1L, 3L, t("2024-01-01 12:00:00"), "a"),
      (1L, 4L, t("2024-01-01 13:00:00"), "b"),
      (2L, 5L, t("2024-01-01 10:00:00"), "a"),
      (2L, 6L, t("2024-01-01 11:00:00"), "a"),
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Funnel.transitionMatrix(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // from a: a->b twice (u1), a->a once (u2) => p 0.6667 / 0.3333;
    // from b: b->a once => p 1.
    assert(got == Seq(
      ("a", "a", 1L, 0.3333), ("a", "b", 2L, 0.6667), ("b", "a", 1L, 1.0)))
  }

  test("rfm: hand-computed recency/frequency/monetary") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 2.5),
      (1L, t("2024-01-03 10:00:00"), 1.5),
      (2L, t("2024-01-05 10:00:00"), 4.0),
    ).toDF("user_id", "ts", "value")
    val got = Funnel.rfm(ev, col("user_id"), col("ts"), col("value"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // corpus last day = Jan 5: u1 recency 2 (last Jan 3), u2 recency 0.
    assert(got == Seq((1L, 2, 2L, 4.0), (2L, 0, 1L, 4.0)))
  }

  test("dailyAnomalies: flag arithmetic on rounded stats; 1-day types excluded") {
    val ev = (1 to 5).flatMap(d => Seq.fill(10)((s"2024-01-0$d", "a"))) ++
      Seq.fill(30)(("2024-01-06", "a")) ++   // the spike day
      Seq(("2024-01-01", "b"))               // single-day type -> excluded
    val df = ev.map { case (d, et) => (t(s"$d 10:00:00"), et) }
      .toDF("ts", "event_type")
    val got = Funnel.dailyAnomalies(df, col("ts"), col("event_type"),
        sigma = 2.0)
      .orderBy("event_type", "day").collect()
    assert(got.forall(_.getString(0) == "a"))
    // counts 10x5 + 30: mean 13.3333, std 8.16; only the 30-day is out.
    val flags = got.map(r => (r.getDate(1).toString, r.getBoolean(5))).toMap
    assert(flags("2024-01-06"))
    assert(flags.count(_._2) == 1)
  }

  test("activeUsers: DAU/WAU/MAU across a month boundary") {
    val ev = Seq(
      (1L, t("2024-01-30 10:00:00")), (2L, t("2024-01-30 11:00:00")),
      (1L, t("2024-01-31 10:00:00")),
      (1L, t("2024-02-01 10:00:00")), (3L, t("2024-02-01 11:00:00")),
    ).toDF("user_id", "ts")
    val got = Funnel.activeUsers(ev, col("user_id"), col("ts"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // Week of Jan 29 spans the month boundary: wau = {1,2,3} = 3 on all
    // three days; January mau = {1,2}, February mau = {1,3}.
    assert(got == Seq(
      ("2024-01-30", 2L, 3L, 2L, 1.0),
      ("2024-01-31", 1L, 3L, 2L, 0.5),
      ("2024-02-01", 2L, 3L, 2L, 1.0)))
  }

  test("rollingActives: hand-computed trailing window, same-day dedup") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 12:00:00")),
      (2L, t("2024-01-02 10:00:00")),
      (1L, t("2024-01-05 10:00:00")),
      (3L, t("2024-01-09 10:00:00")),
    ).toDF("user_id", "ts")
    val got = Funnel.rollingActives(ev, col("user_id"), col("ts"),
        windowDays = 7)
      .orderBy("end_day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    // windows ending on observed days only:
    // Jan 1: {1}; Jan 2: {1,2}; Jan 5: {1,2}; Jan 9: {1(Jan5),3}
    // (Jan 1-2 fell out of the Jan 9 window: 9-6=3).
    assert(got == Seq(
      ("2024-01-01", 1L), ("2024-01-02", 2L),
      ("2024-01-05", 2L), ("2024-01-09", 2L)))
  }

  test("retentionCohorts: hand-computed triangle") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-02 10:00:00")),
      (1L, t("2024-01-02 15:00:00")), // same user+day counts once
      (2L, t("2024-01-01 11:00:00")), (2L, t("2024-01-03 09:00:00")),
      (3L, t("2024-01-02 08:00:00")),
    ).toDF("user_id", "ts")
    val got = Funnel.retentionCohorts(ev, col("user_id"), col("ts"))
      .orderBy("cohort", "offset_days").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L),  // u1, u2 start Jan 1
      ("2024-01-01", 1, 1L),  // u1 returns next day
      ("2024-01-01", 2, 1L),  // u2 returns on day 2
      ("2024-01-02", 0, 1L))) // u3's cohort
  }
}
