package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, LongType, IntegerType, ShortType, ByteType}

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
  * The range-partitioned frame is materialized ONCE ([[Materialize.pin]])
  * before the totals collect: `RangePartitioner` samples afresh per
  * execution, so without pinning, the totals job and the final join
  * could see DIFFERENT partition bounds — broadcast offsets keyed to a
  * `__pid` assignment that no longer exists. The checkpoint makes both
  * jobs read the same materialized partitioning. (On a cluster where
  * executor loss during the query is a concern, set
  * `graft.checkpoint.reliable=true` + a checkpoint dir — the pin then
  * uses reliable `checkpoint()`.) Checkpoint blocks live
  * until the checkpointed RDD is garbage-collected on the driver, at
  * which point the ContextCleaner reclaims them — callers holding the
  * result long-term hold the blocks too; drop the reference (or copy the
  * result out) to release them.
  *
  * Value types: integral (long path, exact), decimal (BigDecimal path,
  * exact), float/double (double path — same left-to-right association a
  * single-window cumsum would produce within each partition). Callers
  * ordering by a non-unique column inherit the same tie ambiguity any
  * window orderBy has.
  */
object ScalableWindow {

  def runningTotal(
      df: DataFrame, orderCol: Column, valueCol: Column,
      as: String, partitions: Int): DataFrame =
    runningTotalBy(df, Seq(orderCol), valueCol, as, partitions)

  /** Multi-column ordering variant: order by `orderCols` left-to-right
    * (each may carry its own asc/desc). Prefer this over folding several
    * columns into one synthetic numeric key — composite keys silently
    * mis-order once a component leaves its assumed band (e.g. hash ids
    * above the band width, or negative), while range partitioning and
    * window ordering take the column list natively. */
  def runningTotalBy(
      df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      as: String, partitions: Int): DataFrame = {
    // Pin one physical partitioning for all downstream jobs (see scaladoc).
    val ranged = Materialize.pin(
      df.repartitionByRange(partitions, orderCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(valueCol).over(w))
    // Exclusive prefix offsets over the (tiny) per-partition totals,
    // accumulated exactly in BigDecimal regardless of the sum's dtype.
    val totalsDf = ranged.groupBy(col("__pid"))
      .agg(sum(valueCol).as("__ptotal"))
    val sumType = totalsDf.schema("__ptotal").dataType
    val totals = totalsDf.collect().map { r =>
      val bd = r.get(1) match {
        case null                      => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal   => d
        case n: java.lang.Number       => new java.math.BigDecimal(n.toString)
        case other => sys.error(s"non-numeric running-total value: $other")
      }
      r.getInt(0) -> bd
    }.sortBy(_._1)
    val offsets = totals
      .scanLeft((0, java.math.BigDecimal.ZERO)) { case ((_, acc), (pid, t)) =>
        (pid, acc.add(t))
      }
      .sliding(2).collect { case Array((_, acc), (pid, _)) => (pid, acc) }
      .toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = sumType match {
      case LongType | IntegerType | ShortType | ByteType =>
        offsets.map { case (p, bd) => (p, bd.longValueExact()) }
          .toDF("__pid", "__offset")
      case DoubleType | FloatType =>
        offsets.map { case (p, bd) => (p, bd.doubleValue()) }
          .toDF("__pid", "__offset")
      case dt: DecimalType =>
        offsets.map { case (p, bd) => (p, BigDecimal(bd)) }
          .toDF("__pid", "__offset")
          .withColumn("__offset", col("__offset").cast(dt))
      case other => sys.error(s"unsupported running-total type: $other")
    }
    local.join(broadcast(offsetDf), Seq("__pid"), "left")
      .withColumn(as, col("__local") + coalesce(col("__offset"), lit(0L).cast(sumType)))
      .drop("__pid", "__local", "__offset")
  }
}
