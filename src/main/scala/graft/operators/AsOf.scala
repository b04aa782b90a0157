package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — the classic time-series operator Spark has no built-in
  * for, in both directions.
  *
  * Per the custom-operator preference order, this is case (a): the
  * semantics ARE expressible by composing built-ins, and the composition
  * is also the right distributed plan — tag both sides, union, then one
  * window pass per key ordered by time carrying the last right-side row
  * forward. ONE shuffle on the key and ONE sort per partition,
  * irrespective of how many right rows precede each left row; the
  * naive range-join formulation (l ⋈ r on key ∧ r.ts ≤ l.ts, then argmax)
  * explodes quadratically on hot keys.
  *
  * Ties: a right row at exactly l.ts counts in BOTH directions (right
  * rows sort before left rows at equal timestamps).
  */
object AsOf {

  /** For each left row, attach `rightValue` from the most recent right
    * row with the same `key` and `rightTs <= leftTs` (null if none).
    * Output: all left columns + `asof_<valueName>`. */
  def join(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      rightValue: Column, valueName: String): DataFrame =
    joinImpl(left, right, key, ts, rightValue, valueName, forward = false)

  /** Forward as-of: for each left row, attach `rightValue` from the
    * EARLIEST right row with the same `key` and `rightTs >= leftTs`
    * (null if none) — the symmetric window over descending time, same
    * one-shuffle/one-sort cost profile. */
  def joinForward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      rightValue: Column, valueName: String): DataFrame =
    joinImpl(left, right, key, ts, rightValue, valueName, forward = true)

  /** Shared implementation: only the time sort direction differs between
    * backward (asc: last prior right row) and forward (desc: first
    * following right row). */
  private def joinImpl(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      rightValue: Column, valueName: String,
      forward: Boolean): DataFrame = {
    val leftTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast("double"))
    val rightTagged = right.select(
      col(key), col(ts),
      lit(0).as("__side"),
      rightValue.cast("double").as("__rv"))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows (__side=0) sort before left rows at equal ts in either
    // direction -> a right row at exactly leftTs is visible to that left
    // row (>= / <= ASOF semantics).
    val tsOrder = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueName", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }
}
