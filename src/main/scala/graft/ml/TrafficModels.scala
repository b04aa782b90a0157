package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ML surface (SURVEY.md §2.I) re-expressed on spark.ml:
  * feature engineering stays pure SQL (TrafficAnalytics flags/labels);
  * estimators are the spark.ml equivalents of the sklearn/xgboost models
  * with the reference's configs (RF 100 trees seed 42, 80/20 split
  * seed 42, GBT approximating XGBoost — I75 notes exact XGBoost parity is
  * out of scope).
  */
object TrafficModels {

  /** I72 — the reference's `train_test_split(test_size=0.2, random_state=42)`. */
  def split(df: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(0.8, 0.2), seed)
    (train, test)
  }

  /** I73 — RF regression `volume ~ features` (TA:153-165, 201-214). */
  def rfRegression(
      train: DataFrame, test: DataFrame,
      features: Seq[String], label: String,
      numTrees: Int = 100, seed: Long = 42L): (PipelineModel, DataFrame) = {
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features.toArray).setOutputCol("features")
        .setHandleInvalid("skip"),
      new RandomForestRegressor().setLabelCol(label).setFeaturesCol("features")
        .setNumTrees(numTrees).setSeed(seed)))
    val model = pipe.fit(train)
    (model, model.transform(test))
  }

  /** I74/I78 — RF classification with label indexing (string labels like
    * Low/Medium/High go through StringIndexer = sklearn LabelEncoder). */
  def rfClassification(
      train: DataFrame, test: DataFrame,
      features: Seq[String], label: String,
      numTrees: Int = 100, seed: Long = 42L): (PipelineModel, DataFrame) = {
    val pipe = new Pipeline().setStages(Array(
      new StringIndexer().setInputCol(label).setOutputCol("__label")
        .setStringOrderType("alphabetAsc").setHandleInvalid("skip"),
      new VectorAssembler().setInputCols(features.toArray).setOutputCol("features")
        .setHandleInvalid("skip"),
      new RandomForestClassifier().setLabelCol("__label").setFeaturesCol("features")
        .setNumTrees(numTrees).setSeed(seed)))
    val model = pipe.fit(train)
    (model, model.transform(test))
  }

  /** I75 — GBT regression (the closest built-in to the prototype's
    * XGBRegressor(100, lr=.1, depth=5); documented approximation). */
  def gbtRegression(
      train: DataFrame, test: DataFrame,
      features: Seq[String], label: String,
      maxIter: Int = 100, seed: Long = 42L): (PipelineModel, DataFrame) = {
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(features.toArray).setOutputCol("features")
        .setHandleInvalid("skip"),
      new GBTRegressor().setLabelCol(label).setFeaturesCol("features")
        .setMaxIter(maxIter).setStepSize(0.1).setMaxDepth(5).setSeed(seed)))
    val model = pipe.fit(train)
    (model, model.transform(test))
  }

  /** I76 — MSE and R², computed in pure SQL (one aggregate pass; exactly
    * the formulas the reference prints). */
  def regressionMetricsSql(pred: DataFrame, label: String): (Double, Double) = {
    val y = col(label).cast("double")
    val r = pred.agg(
      count(y).as("n"), sum(y).as("sy"), sum(y * y).as("syy"),
      sum(pow(y - col("prediction"), 2)).as("sse"))
      .collect().head
    val n = r.getLong(0).toDouble
    val (sy, syy, sse) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val sst = syy - sy * sy / n
    (sse / n, 1.0 - sse / sst)
  }

  /** I76 via spark.ml evaluators (cross-check of the SQL metrics). */
  def regressionMetrics(pred: DataFrame, label: String): (Double, Double) = {
    val mse = new RegressionEvaluator().setLabelCol(label)
      .setPredictionCol("prediction").setMetricName("mse").evaluate(pred)
    val r2 = new RegressionEvaluator().setLabelCol(label)
      .setPredictionCol("prediction").setMetricName("r2").evaluate(pred)
    (mse, r2)
  }

  /** I77 — per-class precision/recall/F1 (classification_report analog),
    * pure SQL over the prediction frame. */
  def classificationReport(pred: DataFrame): DataFrame = {
    val counts = pred.groupBy(col("__label").as("label"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("prediction") === col("__label"), 1).otherwise(0)).as("tp"))
    val predicted = pred.groupBy(col("prediction"))
      .agg(count(lit(1)).as("n_pred"))
    counts.join(predicted, counts("label") === predicted("prediction"), "left")
      .withColumn("precision", coalesce(col("tp") / col("n_pred"), lit(0.0)))
      .withColumn("recall", col("tp") / col("support"))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .select("label", "support", "precision", "recall", "f1")
      .orderBy("label")
  }

  /** I77 — confusion matrix = groupBy(label).pivot(pred).count. */
  def confusionMatrix(pred: DataFrame): DataFrame =
    pred.groupBy(col("__label").as("label"))
      .pivot("prediction")
      .count()
      .na.fill(0)
      .orderBy("label")

  /** I79 — feature importances, sorted descending. */
  def featureImportances(model: PipelineModel, features: Seq[String]): Seq[(String, Double)] = {
    val imps = model.stages.last match {
      case m: org.apache.spark.ml.regression.RandomForestRegressionModel => m.featureImportances
      case m: org.apache.spark.ml.classification.RandomForestClassificationModel => m.featureImportances
      case m: org.apache.spark.ml.regression.GBTRegressionModel => m.featureImportances
      case other => throw new IllegalArgumentException(s"no importances on $other")
    }
    features.zip(imps.toArray).sortBy(-_._2)
  }
}
