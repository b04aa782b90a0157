package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Wave-19 operators: revenue concentration, segmented funnel,
  * user-diversity histogram. */
class Wave19Spec extends SparkSpec {
  import spark.implicits._

  test("revenueConcentration: cutoffs, tie-inclusion, shares on the money grid") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    // ten users with revenues 10,20,...,100 (one purchase each)
    val events = (1 to 10).map(i =>
      (i.toLong, t(i), "purchase", i * 10.0)).toDF(
      "user_id", "ts", "event_type", "value")
    val got = Funnel.revenueConcentration(events, col("user_id"),
        col("value"), col("event_type"), "purchase", pcts = Seq(10, 50))
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // p90 of 10..100 = 91.0 -> only the 100-user clears; share 100/550
    assert(got(10) == ((91.0, 1L, 100.0,
      BigDecimal(100.0 / 550).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // p50 = 55.0 -> users 60..100 clear; share 400/550
    assert(got(50) == ((55.0, 5L, 400.0,
      BigDecimal(400.0 / 550).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("segmentedFunnel: per-anchor-hour rates, at-or-after semantics") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // hour 9: u1 converts, u2 does not
      (1L, t("2024-01-01 09:00:00"), "view", 0.0),
      (1L, t("2024-01-01 10:00:00"), "purchase", 1.0),
      (2L, t("2024-01-01 09:30:00"), "view", 0.0),
      // hour 12: u3's purchase PRECEDES its first view -> not converted
      (3L, t("2024-01-01 11:00:00"), "purchase", 1.0),
      (3L, t("2024-01-01 12:00:00"), "view", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Funnel.segmentedFunnel(events, col("user_id"), col("ts"),
        col("event_type"), "view", "purchase", t1 => hour(t1))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(9) == ((2L, 1L, 0.5)))
    assert(got(12) == ((1L, 0L, 0.0)))
  }

  test("userDiversityHistogram: boundary buckets land exactly") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val events = (
      // u1: single type -> H = 0 exactly -> bucket 0
      Seq((1L, t(1), "A"), (1L, t(2), "A"), (1L, t(3), "A")) ++
      // u2: perfectly uniform over both types -> H = ln 2 = hmax -> bucket 9
      Seq((2L, t(1), "A"), (2L, t(2), "B")) ++
      // u3: 3-of-A, 1-of-B -> H strictly inside (0, ln 2)
      Seq((3L, t(1), "A"), (3L, t(2), "A"), (3L, t(3), "A"), (3L, t(4), "B"))
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.userDiversityHistogram(events, col("user_id"),
        col("event_type"), nBuckets = 10)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got(0) == 1L, "single-type user in bucket 0")
    assert(got(9) == 1L, "uniform user caught by the least guard")
    val h3 = math.log(4) - (3 * math.log(3)) / 4.0
    val b3 = math.min(9, math.floor(h3 * 10 / math.log(2)).toInt)
    assert(got(b3) == 1L, s"mixed user in bucket $b3")
    assert(got.values.sum == 3L)
  }

  test("userDiversityHistogram: a single observed event type (hMax = 0) " +
    "puts every user in bucket 0, not NaN") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val events = Seq((1L, t(1), "A"), (1L, t(2), "A"), (2L, t(3), "A"))
      .toDF("user_id", "ts", "event_type")
    val rows = Funnel.userDiversityHistogram(events, col("user_id"),
        col("event_type"), nBuckets = 10).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(0) == 0, "bucket must be 0, not NaN/null")
    assert(r.getLong(3) == 2L)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
  }
}
