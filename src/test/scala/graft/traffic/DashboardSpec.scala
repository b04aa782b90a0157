package graft.traffic

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DashboardSpec extends SparkSpec {

  private lazy val snapshot = Dashboard.prepare(TrafficFixture.raw(spark, 400)).cache()

  test("prepare adds datetime and WGS84 coordinates to every snapshot") {
    assert(snapshot.columns.contains("datetime"))
    // fixture's realistic state-plane coords (x ≈ 997k ft) land in NYC;
    // adversarial POINT(1 2) rows legitimately reproject far away
    val r = snapshot.where(col("latitude").isNotNull && col("x_coord") > 900000)
      .select("latitude", "longitude").collect()
    assert(r.nonEmpty)
    assert(r.forall { row =>
      val (lat, lon) = (row.getDouble(0), row.getDouble(1))
      lat > 39 && lat < 42 && lon > -75 && lon < -72
    })
  }

  test("all six dashboard figures produce rows; street filter applies") {
    val figs = Dashboard.figures(snapshot, "BROADWAY").toMap
    assert(figs.size == 6)
    figs.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name empty")
    }
    assert(figs("top_streets").count() <= 5)
  }

  test("street options are distinct and sorted") {
    val opts = Dashboard.streetOptions(snapshot).collect().map(_.getString(0))
    assert(opts.toSeq == opts.toSeq.sorted)
    assert(opts.distinct.length == opts.length)
    assert(opts.contains("BROADWAY"))
  }
}
