package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Funnel}

/** Wave-14 operators: PSI distribution drift, join fan-out profile,
  * conversion-lag cohorts. */
class Wave14Spec extends SparkSpec {
  import spark.implicits._

  test("psiDrift: shifted unit is flagged, matched unit is not; grid is complete") {
    // unit "low" all in the bottom of the range, "hi" all at the top;
    // "mid" mirrors the rest's half-low/half-high mix, so it should
    // NOT drift while the two concentrated units do.
    val rows =
      (1 to 50).map(i => ("low", (i % 10).toDouble)) ++
      (1 to 50).map(i =>
        ("mid", if (i % 2 == 0) (i % 10).toDouble else 90.0 + (i % 10))) ++
      (1 to 50).map(i => ("hi", 90.0 + (i % 10)))
    val df = rows.toDF("src", "len")
    val got = CorpusStats.psiDrift(df, col("src"), col("len"),
        nBuckets = 10, flagAt = 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // independent reimplementation of the smoothed complete-grid PSI
    val buckets = 0 until 10
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    def bucketOf(v: Double): Int =
      math.min(9, math.floor((v - mn) * 10 / (mx - mn)).toInt)
    val all = rows.map { case (u, v) => (u, bucketOf(v)) }
    def psiOf(u: String): Double = {
      val mine = all.filter(_._1 == u)
      val rest = all.filterNot(_._1 == u)
      val s = buckets.map { b =>
        val p = (mine.count(_._2 == b) + 0.5) / (mine.size + 5.0)
        val q = (rest.count(_._2 == b) + 0.5) / (rest.size + 5.0)
        (p - q) * math.log(p / q)
      }.sum
      BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq("low", "mid", "hi").foreach { u =>
      val (n, psi, flag) = got(u)
      assert(n == 50L)
      assert(math.abs(psi - psiOf(u)) <= 1e-4, s"psi($u): $psi vs ${psiOf(u)}")
      assert(flag == (psi > 0.2))
    }
    assert(got("low")._3 && got("hi")._3, "shifted units must flag")
    assert(!got("mid")._3, "representative unit must not flag")
  }

  test("fanoutProfile: exact interpolated degree percentiles") {
    val child = (Seq.fill(1)(10L) ++ Seq.fill(2)(20L) ++ Seq.fill(3)(30L) ++
      Seq.fill(4)(40L)).map(Tuple1(_)).toDF("k")
    val r = CorpusStats.fanoutProfile(
      Seq(("c->p", child, col("k")))).collect().head
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 4L, "n_parents")
    assert(r.getLong(2) == 10L, "n_children")
    assert(r.getDouble(3) == 2.5d, "mean")
    assert(r.getDouble(4) == 2.5d, "p50")
    assert(r.getDouble(5) == 3.7d, "p90")
    assert(r.getDouble(6) == 3.97d, "p99")
    assert(r.getLong(7) == 4L, "max")
  }

  test("fanoutProfile: null keys are excluded from degrees") {
    val child = Seq(Option(1L), Option(1L), None).map(Tuple1(_)).toDF("k")
    val r = CorpusStats.fanoutProfile(
      Seq(("c->p", child, col("k")))).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L && r.getLong(7) == 2L)
  }

  test("conversionLag: first-touch anchor, at-or-after match, cohort day") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1: click 10:00, purchase 11:00 same day -> lag 3600s
      (1L, t("2024-01-01 10:00:00"), "click"),
      (1L, t("2024-01-01 11:00:00"), "purchase"),
      // u2: purchase strictly BEFORE the only click -> no conversion row
      (2L, t("2024-01-01 09:00:00"), "purchase"),
      (2L, t("2024-01-01 10:00:00"), "click"),
      // u3: click only -> no row
      (3L, t("2024-01-01 10:00:00"), "click"),
      // u4: click day1; purchases day2 and day3 -> first one counts,
      //     cohorted on the day-1 click
      (4L, t("2024-01-01 08:00:00"), "click"),
      (4L, t("2024-01-02 08:00:00"), "purchase"),
      (4L, t("2024-01-03 08:00:00"), "purchase"),
      // u5: purchase at exactly the click ts -> lag 0 counts
      (5L, t("2024-01-02 12:00:00"), "click"),
      (5L, t("2024-01-02 12:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversionLag(events, col("user_id"), col("ts"),
        col("event_type"), "click", "purchase")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val lag1 = 3600.0
    val lag4 = 24.0 * 3600
    val mean = (lag1 + lag4) / 2
    val p50 = lag1 + 0.5 * (lag4 - lag1)
    val p90 = lag1 + 0.9 * (lag4 - lag1)
    assert(got("2024-01-01") == ((2L, mean, p50, p90)))
    assert(got("2024-01-02") == ((1L, 0.0, 0.0, 0.0)))
    assert(got.size == 2)
  }
}
