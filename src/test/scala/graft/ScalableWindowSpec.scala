package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScalableWindow

class ScalableWindowSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase running total equals the single-window formulation") {
    val df = (0 until 500).map(i => (i.toLong, ((i * 37) % 90 + 1).toLong))
      .toDF("id", "v").repartition(7)
    val naive = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scaled = ScalableWindow.runningTotal(df, col("id"), col("v"), "cum", 8)
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scaled == naive)
  }

  test("window runs range-partitioned, not as a global single-task window") {
    val df = (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "v")
    val out = ScalableWindow.runningTotal(df, col("id"), col("v"), "cum", 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), s"plan:\n$plan")
    // the cumsum window is keyed by partition id (parallel), never global
    assert(plan.contains("windowspecdefinition(__pid"), s"plan:\n$plan")
    val last = out.orderBy(desc("id")).select("cum").collect().head.getLong(0)
    assert(last == 100L)
  }
}
