package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Funnel}

/** Wave-15 operators: chi-square independence, Neyman allocation,
  * peak session concurrency. */
class Wave15Spec extends SparkSpec {
  import spark.implicits._

  test("chiSquareIndependence: uniform table scores zero") {
    val rows = for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)
    val r = CorpusStats.chiSquareIndependence(rows.toDF("a", "b"),
      col("a"), col("b")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((2L, 2L, 1L, 20L, 0.0)))
  }

  test("chiSquareIndependence: the empty cell contributes its expectation") {
    // (y,q) never occurs: 4x(x,p), 4x(x,q), 4x(y,p).
    // Marginals r=(8,4), c=(8,4), N=12; chi2 = 1/3+2/3+2/3+4/3 = 3.0 —
    // the 4/3 term IS the missing cell; dropping it would report 5/3.
    val rows = Seq.fill(4)(("x", "p")) ++ Seq.fill(4)(("x", "q")) ++
      Seq.fill(4)(("y", "p"))
    val r = CorpusStats.chiSquareIndependence(rows.toDF("a", "b"),
      col("a"), col("b")).collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 12L)
    assert(r.getDouble(4) == 3.0, s"chi2 ${r.getDouble(4)}")
  }

  test("neymanAllocation: spread-proportional, capped, zero-sigma kept") {
    val docs = (Seq(("A", 0.0), ("A", 10.0), ("A", 0.0), ("A", 10.0)) ++
      Seq(("B", 5.0), ("B", 5.0), ("B", 5.0)) ++ Seq(("C", 7.0)))
      .toDF("stratum", "v")
    val got = CorpusStats.neymanAllocation(docs, col("stratum"), col("v"),
        budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    // A: n=4, sigma=round(5.7735,2)=5.77 — all weight; capped at 4 rows
    assert(got("A") == ((4L, 5.77, 1000.0, 4L)))
    // B constant -> sigma 0, explicit zero allocation (not dropped)
    assert(got("B") == ((3L, 0.0, 0.0, 0L)))
    // C single row -> sigma null coalesced to 0, still reported
    assert(got("C") == ((1L, 0.0, 0.0, 0L)))
  }

  test("neymanAllocation: all-zero spread reports null allocations") {
    val docs = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("stratum", "v")
    val got = CorpusStats.neymanAllocation(docs, col("stratum"), col("v"),
      budget = 10L).collect()
    assert(got.length == 2 && got.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("peakConcurrency: overlap, closed-interval touch, single-event session") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1: one session 09:00-10:00 (gaps < 30 min)
      (1L, t("2024-01-01 09:00:00")), (1L, t("2024-01-01 09:20:00")),
      (1L, t("2024-01-01 09:40:00")), (1L, t("2024-01-01 10:00:00")),
      // u2: one session 09:30-10:30, overlapping u1
      (2L, t("2024-01-01 09:30:00")), (2L, t("2024-01-01 09:50:00")),
      (2L, t("2024-01-01 10:10:00")), (2L, t("2024-01-01 10:30:00")),
      // u3: single event exactly at u2's end — closed intervals touch
      (3L, t("2024-01-01 10:30:00")),
      // u4: a lone zero-length session on a quiet day still peaks at 1
      (4L, t("2024-01-02 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Funnel.peakConcurrency(events, col("user_id"), col("ts"),
        gapMicros = 30L * 60L * 1000000L)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("2024-01-01") == ((2L, 6L)))
    assert(got("2024-01-02") == ((1L, 2L)))
  }
}
