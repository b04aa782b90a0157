package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.traffic.{Normalize, TrafficAnalytics, TrafficFixture}

class TrafficModelsSpec extends SparkSpec {

  private lazy val norm = TrafficAnalytics.withTrafficCategory(
    Normalize(TrafficFixture.raw(spark, 400))
      .na.drop(Seq("volume", "hour", "segment_id")))
    .cache()

  test("80/20 split is seeded and disjoint (I72)") {
    val (tr, te) = TrafficModels.split(norm)
    val (tr2, te2) = TrafficModels.split(norm)
    assert(tr.count() == tr2.count() && te.count() == te2.count())
    assert(tr.count() + te.count() == norm.count())
    val frac = te.count().toDouble / norm.count()
    assert(frac > 0.1 && frac < 0.3, s"test frac $frac")
  }

  test("RF regression trains and predicts (I73), metrics agree (I76)") {
    val (tr, te) = TrafficModels.split(norm)
    val (model, pred) = TrafficModels.rfRegression(
      tr, te, Seq("segment_id", "hour"), "volume", numTrees = 5)
    assert(pred.count() > 0)
    val (mseSql, r2Sql) = TrafficModels.regressionMetricsSql(pred, "volume")
    val (mseMl, r2Ml) = TrafficModels.regressionMetrics(pred, "volume")
    assert(math.abs(mseSql - mseMl) < 1e-6 * math.max(1.0, mseMl))
    assert(math.abs(r2Sql - r2Ml) < 1e-6)
    val imps = TrafficModels.featureImportances(model, Seq("segment_id", "hour"))
    assert(math.abs(imps.map(_._2).sum - 1.0) < 1e-9)
    assert(imps.map(_._2).toSeq == imps.map(_._2).sorted.reverse.toSeq)
  }

  test("RF classification on Low/Medium/High labels (I74/I78)") {
    val (tr, te) = TrafficModels.split(norm)
    val (_, pred) = TrafficModels.rfClassification(
      tr, te, Seq("volume"), "traffic_category", numTrees = 5)
    // volume alone determines the label -> near-perfect accuracy
    val acc = pred.filter(col("prediction") === col("__label")).count().toDouble /
      pred.count()
    assert(acc > 0.95, s"accuracy $acc")
    val report = TrafficModels.classificationReport(pred).collect()
    assert(report.nonEmpty)
    assert(report.forall(r => r.getAs[Double]("f1") >= 0 && r.getAs[Double]("f1") <= 1))
    val cm = TrafficModels.confusionMatrix(pred)
    assert(cm.count() == report.length)
  }

  test("GBT regression (XGBoost approximation, I75) trains") {
    val (tr, te) = TrafficModels.split(norm)
    val (_, pred) = TrafficModels.gbtRegression(
      tr, te, Seq("segment_id", "hour"), "volume", maxIter = 3)
    assert(pred.select("prediction").count() > 0)
  }

  test("GBT fit quality is pinned vs the RF baseline (I75 parity gate)") {
    // XGBoost itself isn't runnable here (no dependency, by design —
    // SURVEY §7.3 declares GBT the approximation), so the parity gate is
    // fit CAPACITY on the same task the reference hands XGBRegressor:
    // volume ~ (segment_id, hour), same metrics the reference prints
    // (MSE/R²). Measured IN-SAMPLE: on this fixture every feature combo
    // occurs exactly once, so the held-out rows are unseen combos of a
    // non-smooth target ((i*37)%400) that NO tree learner — XGBoost
    // included — can interpolate (both models score negative test R²);
    // what distinguishes a boosted ensemble is whether it can FIT the
    // deterministic mapping, which is exactly what in-sample R² pins.
    // Floors sit below the measured values (COVERAGE.md I75) to absorb
    // jitter; the RF comparison pins boosting's capacity edge.
    val (tr, _) = TrafficModels.split(norm)
    // gbtRegression/rfRegression already return predictions on their
    // second argument (tr here) — reuse them instead of transforming again.
    val (_, gbtPred) = TrafficModels.gbtRegression(
      tr, tr, Seq("segment_id", "hour"), "volume", maxIter = 100)
    val (gbtMse, gbtR2) =
      TrafficModels.regressionMetricsSql(gbtPred, "volume")
    val (_, rfPred) = TrafficModels.rfRegression(
      tr, tr, Seq("segment_id", "hour"), "volume", numTrees = 40)
    val (rfMse, rfR2) =
      TrafficModels.regressionMetricsSql(rfPred, "volume")
    info(f"in-sample GBT mse=$gbtMse%.2f r2=$gbtR2%.4f | RF mse=$rfMse%.2f r2=$rfR2%.4f")
    assert(gbtR2 > 0.8, s"GBT in-sample r2 $gbtR2")
    assert(gbtR2 >= rfR2, s"GBT in-sample r2 $gbtR2 vs RF $rfR2")
  }

  test("GBT held-out R² on a smooth learnable task (I75 out-of-sample)") {
    import spark.implicits._
    // The hash-like traffic fixture makes held-out R² meaningless for ANY
    // tree learner (see the in-sample gate above). This fixture is the
    // complementary case — the quantity the reference actually prints
    // (held-out MSE/R², TrafficAnalysis_Hist.py) on a task where
    // generalization is possible: volume is smooth in hour (sinusoid),
    // monotone in segment, plus bounded deterministic noise, with each
    // (segment, hour) combo observed twice so the 80/20 split leaves
    // interpolable structure.
    val rows = (0 until 2400).map { i =>
      val seg = i % 50
      val hour = (i / 50) % 24
      val noise = ((i * 2654435761L % 1000L) / 1000.0 - 0.5) * 6.0
      val volume = 100.0 + 40.0 * math.sin(2 * math.Pi * hour / 24.0) +
        0.5 * seg + noise
      (i.toLong, seg, hour, volume)
    }
    val df = rows.toDF("id", "segment_id", "hour", "volume")
    val (tr, te) = TrafficModels.split(df)
    val (_, gbtPred) = TrafficModels.gbtRegression(
      tr, te, Seq("segment_id", "hour"), "volume", maxIter = 60)
    val (gbtMse, gbtR2) = TrafficModels.regressionMetricsSql(gbtPred, "volume")
    val (_, rfPred) = TrafficModels.rfRegression(
      tr, te, Seq("segment_id", "hour"), "volume", numTrees = 40)
    val (rfMse, rfR2) = TrafficModels.regressionMetricsSql(rfPred, "volume")
    info(f"held-out GBT mse=$gbtMse%.2f r2=$gbtR2%.4f | RF mse=$rfMse%.2f r2=$rfR2%.4f")
    // The boosted model must genuinely generalize here (the reference's
    // XGBoost use case), and the bagged baseline must too — this pins
    // that the in-sample-only gate above is a fixture property, not a
    // learner defect.
    assert(gbtR2 > 0.85, s"GBT held-out r2 $gbtR2")
    assert(rfR2 > 0.5, s"RF held-out r2 $rfR2")
  }
}
