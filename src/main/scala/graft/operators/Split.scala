package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable dataset splitting — the reproducible
  * train/test/holdout assignment a training-data pipeline needs.
  *
  * `randomSplit` depends on partition layout and sampler state; this
  * assigns each row by the md5 of its id, so the SAME row lands in the
  * SAME split on any engine, any partitioning, any run — and the split
  * is stable under corpus growth (new rows don't reshuffle old ones).
  * md5 hex is identical across Spark, DuckDB, and virtually everything
  * else, which also makes the assignment SQL-expressible for oracles
  * and downstream non-Spark consumers.
  */
object Split {

  /** Two-hex-digit threshold below which a row is in the held-out split:
    * fraction ≈ frac with 1/256 granularity, clamped to [1/256, 255/256].
    * The upper clamp matters: frac ≥ 255.5/256 would otherwise round to
    * 256 and format as the THREE-char "100", which sorts below "11" and
    * silently keeps ~6.6% instead of ~100%. */
  private[operators] def hexThreshold(frac: Double): String = {
    require(frac > 0 && frac < 1, "frac must be in (0, 1)")
    f"${math.min(255, math.max(1, math.round(frac * 256).toInt))}%02x"
  }

  /** Split tag column: `heldOutName` for ~`frac` of rows (by id hash),
    * `restName` otherwise. */
  def tag(
      id: Column, frac: Double,
      heldOutName: String = "test", restName: String = "train"): Column =
    when(substring(md5(id.cast("string")), 1, 2) < hexThreshold(frac),
      lit(heldOutName)).otherwise(lit(restName))

  /** Convenience: (heldOut, rest) DataFrames by deterministic id hash. */
  def holdOut(df: DataFrame, id: Column, frac: Double): (DataFrame, DataFrame) = {
    val t = tag(id, frac)
    (df.filter(t === "test"), df.filter(t === "train"))
  }

  /** Threshold with the [0,1] edges admitted: 0 keeps nothing (no hex
    * pair sorts below "00"), 1 keeps everything ("zz" sorts above every
    * hex pair). */
  private[operators] def hexThresholdOrEdge(frac: Double): String =
    if (frac <= 0) "00" else if (frac >= 1) "zz" else hexThreshold(frac)

  /** Deterministic stratified sampling — the corpus-mixing primitive of
    * a training-data pipeline: each stratum (source, language, quality
    * band) keeps its own fraction of rows, selected by the md5 of the
    * row id. Same row kept on any engine / partitioning / run; stable
    * under corpus growth; SQL-expressible for oracles and non-Spark
    * consumers. Evaluated as a plain pushable filter — no sampler state,
    * no shuffle. `rates` maps stratum value → keep fraction in [0, 1];
    * unlisted strata use `defaultRate` (granularity 1/256, like [[tag]]). */
  def stratifiedSample(
      df: DataFrame, stratum: Column, id: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThresholdOrEdge(defaultRate))) {
      case (acc, (value, frac)) =>
        when(stratum === value, lit(hexThresholdOrEdge(frac))).otherwise(acc)
    }
    df.filter(substring(md5(id.cast("string")), 1, 2) < threshold)
  }
}
