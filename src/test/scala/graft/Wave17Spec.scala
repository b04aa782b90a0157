package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Funnel}

/** Wave-17 operators: two-sample KS test, transition dwell profile,
  * cohort LTV curve. */
class Wave17Spec extends SparkSpec {
  import spark.implicits._

  test("ksTwoSample: identical halves score 0; disjoint halves score 1") {
    val same = (1 to 40).map(i => ("same", (((i - 1) / 2) % 10).toLong, i % 2 == 0))
    val apart = (1 to 40).map(i =>
      ("apart", if (i % 2 == 0) (i % 5).toLong else 100L + (i % 5), i % 2 == 0))
    val df = (same ++ apart).toDF("k", "v", "s")
    val got = CorpusStats.ksTwoSample(df, col("k"), col("v"), col("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got("same") == ((20L, 20L, 0.0, false)))
    assert(got("apart") == ((20L, 20L, 1.0, true)))
  }

  test("ksTwoSample: tie convention — D evaluated after folding a value's ties") {
    // side1 = {1,1}, side2 = {1,2}: at v=1, F1=1.0, F2=0.5 -> D=0.5;
    // the naive per-row walk would see intermediate 0.75.
    val df = Seq(("k", 1L, true), ("k", 1L, true),
      ("k", 1L, false), ("k", 2L, false)).toDF("k", "v", "s")
    val r = CorpusStats.ksTwoSample(df, col("k"), col("v"), col("s"))
      .collect().head
    assert(r.getDouble(3) == 0.5)
  }

  test("ksTwoSample: one-sided key is dropped (no comparison exists)") {
    val df = Seq(("k", 1L, true), ("k", 2L, true)).toDF("k", "v", "s")
    assert(CorpusStats.ksTwoSample(df, col("k"), col("v"), col("s"))
      .count() == 0)
  }

  test("transitionDwell: exact pair extraction and second-scale stats") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1: A -(60s)-> B -(120s)-> B
      (1L, t("2024-01-01 10:00:00"), "A", 1L),
      (1L, t("2024-01-01 10:01:00"), "B", 2L),
      (1L, t("2024-01-01 10:03:00"), "B", 3L),
      // u2: A -(180s)-> B; same-ts tie resolved by event_id: C then D
      (2L, t("2024-01-01 11:00:00"), "A", 4L),
      (2L, t("2024-01-01 11:03:00"), "B", 5L),
      (3L, t("2024-01-01 12:00:00"), "C", 6L),
      (3L, t("2024-01-01 12:00:00"), "D", 7L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.transitionDwell(events, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // A->B: dwells 60s and 180s -> mean 120, p50 120, p90 168
    assert(got(("A", "B")) == ((2L, 120.0, 120.0, 168.0)))
    assert(got(("B", "B")) == ((1L, 120.0, 120.0, 120.0)))
    assert(got(("C", "D")) == ((1L, 0.0, 0.0, 0.0)))
    assert(got.size == 3)
  }

  test("ltvCurve: cohort-aligned offsets, tail cap, fixed denominator") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1 onboards day 1 (view); pays 10 on day 1, 20 on day 3
      (1L, t("2024-01-01 09:00:00"), "view", Option.empty[Double]),
      (1L, t("2024-01-01 10:00:00"), "purchase", Some(10.0)),
      (1L, t("2024-01-03 10:00:00"), "purchase", Some(20.0)),
      // u2 onboards day 2; pays 5 far past the cap (folds into bucket 3)
      (2L, t("2024-01-02 09:00:00"), "view", Option.empty[Double]),
      (2L, t("2024-02-15 09:00:00"), "purchase", Some(5.0)),
      // u3 onboards day 1, never pays — still in the denominator
      (3L, t("2024-01-01 09:00:00"), "view", Option.empty[Double])
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Funnel.ltvCurve(events, col("user_id"), col("ts"),
        col("event_type"), col("value"), convType = "purchase", maxDays = 3)
      .orderBy("day_offset").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0, 1L, 10.0, 10.0, 10.0 / 3 roundAt 4),
      (2, 1L, 20.0, 30.0, 10.0),
      (3, 1L, 5.0, 35.0, 35.0 / 3 roundAt 4)))
  }

  private implicit class RoundAt(x: Double) {
    def roundAt(dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
