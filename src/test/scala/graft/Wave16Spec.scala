package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Wave-16 operators: two-proportion A/B test, session entry/exit
  * matrix. */
class Wave16Spec extends SparkSpec {
  import spark.implicits._

  private def parityCohort =
    when(((col("user_id") % 2) + 2) % 2 === 0, "A").otherwise("B")

  test("abTestProportions: balanced design scores z = 0, no flag") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // A (even ids): u2 converts, u4 exposed only
      (2L, t("2024-01-01 10:00:00"), "view"),
      (2L, t("2024-01-01 11:00:00"), "purchase"),
      (4L, t("2024-01-01 10:00:00"), "view"),
      // B (odd ids): u1's purchase precedes its first view (no), u3 converts
      (1L, t("2024-01-01 09:00:00"), "purchase"),
      (1L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 10:00:00"), "view"),
      (3L, t("2024-01-01 10:30:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.abTestProportions(events, col("user_id"), col("ts"),
      col("event_type"), parityCohort, "A", "B", "view", "purchase")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)) ==
      ((2L, 1L, 2L, 1L)))
    assert(r.getDouble(2) == 0.5 && r.getDouble(5) == 0.5)
    assert(r.getDouble(6) == 0.0 && !r.getBoolean(7))
  }

  test("abTestProportions: strong lift flags, z matches the closed form") {
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // A: 30 exposed, 25 convert; B: 30 exposed, 5 convert
    val a = (1 to 30).flatMap { i =>
      val u = 2L * i
      Seq((u, t(9), "view")) ++
        (if (i <= 25) Seq((u, t(10), "purchase")) else Nil)
    }
    val b = (1 to 30).flatMap { i =>
      val u = 2L * i + 1
      Seq((u, t(9), "view")) ++
        (if (i <= 5) Seq((u, t(10), "purchase")) else Nil)
    }
    val r = Funnel.abTestProportions((a ++ b).toDF("user_id", "ts", "event_type"),
      col("user_id"), col("ts"), col("event_type"), parityCohort,
      "A", "B", "view", "purchase").collect().head
    val (pa, pb, pp) = (25.0 / 30, 5.0 / 30, 30.0 / 60)
    val se = math.sqrt(pp * (1 - pp) * (1.0 / 30 + 1.0 / 30))
    val z = BigDecimal((pa - pb) / se)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) == z, s"z ${r.getDouble(6)} vs $z")
    assert(r.getBoolean(7), "strong lift must flag")
  }

  test("entryExitMatrix: first/last per session, tie-break, bounce diagonal") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1: one session A -> B -> C
      (1L, t("2024-01-01 10:00:00"), "A", 1L),
      (1L, t("2024-01-01 10:05:00"), "B", 2L),
      (1L, t("2024-01-01 10:10:00"), "C", 3L),
      // u2: single-event session (bounce) D -> D
      (2L, t("2024-01-01 10:00:00"), "D", 4L),
      // u3: two events at the SAME ts — event_id orders them: P -> Q
      (3L, t("2024-01-01 10:00:00"), "P", 10L),
      (3L, t("2024-01-01 10:00:00"), "Q", 11L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Funnel.entryExitMatrix(events, col("user_id"), col("ts"),
        col("event_type"), col("event_id"), gapMicros = 30L * 60L * 1000000L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("A", "C")) == ((1L, 0.3333)))
    assert(got(("D", "D")) == ((1L, 0.3333)))
    assert(got(("P", "Q")) == ((1L, 0.3333)))
    assert(got.size == 3)
  }
}
