package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global running totals.
  *
  * `Window.orderBy(...)` with no partitioning collapses the whole input
  * into ONE task — fine for post-aggregation frames (a few thousand
  * rows), fatal on raw data at scale. This is the classic two-phase
  * rewrite:
  *
  *   1. range-repartition by the order column (global order across
  *      partitions, Spark's own sort machinery),
  *   2. per-partition local cumulative sum (parallel windows),
  *   3. per-partition totals → exclusive prefix offsets (one tiny
  *      collect of #partitions rows, broadcast back),
  *   4. global cumsum = local cumsum + partition offset.
  *
  * Results are identical to the single-window formulation for exact
  * (integer/decimal) values; callers ordering by a non-unique column
  * inherit the same tie ambiguity any window orderBy has.
  */
object ScalableWindow {

  def runningTotal(
      df: DataFrame, orderCol: Column, valueCol: Column,
      as: String, partitions: Int): DataFrame = {
    val ranged = df.repartitionByRange(partitions, orderCol)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(valueCol).over(w))
    // exclusive prefix offsets over the (tiny) per-partition totals
    val totals = local.groupBy(col("__pid"))
      .agg(sum(valueCol).as("__ptotal"))
      .collect().map(r => r.getAs[Int]("__pid") -> r.getAs[Long]("__ptotal"))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("__pid", "__offset")
    local.join(broadcast(offsetDf), Seq("__pid"), "left")
      .withColumn(as, col("__local") + coalesce(col("__offset"), lit(0L)))
      .drop("__pid", "__local", "__offset")
  }
}
