package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(0.0, 12.5, 25.0, 39.9, 40.0, 59.9, 60.0, 99.9, 250.0)
    .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "x")
  // Overlapping, bucket-unaligned intervals: [0,60), [40,100), [90,95)
  private lazy val intervals = Seq((0L, 0.0, 60.0), (1L, 40.0, 100.0), (2L, 90.0, 95.0))
    .toDF("iv", "lo", "hi")

  private def expected: Set[(Long, Long)] =
    (for {
      (pid, x) <- Seq(0.0, 12.5, 25.0, 39.9, 40.0, 59.9, 60.0, 99.9, 250.0).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
      (iv, lo, hi) <- Seq((0L, 0.0, 60.0), (1L, 40.0, 100.0), (2L, 90.0, 95.0))
      if x >= lo && x < hi
    } yield (pid, iv)).toSet

  test("bucketed point-in-interval equals the nested-loop result exactly") {
    for (w <- Seq(7.0, 25.0, 60.0, 200.0)) {
      val got = RangeJoin.pointInInterval(points, col("x"), intervals,
          col("lo"), col("hi"), bucketWidth = w)
        .select("pid", "iv").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"bucketWidth=$w: $got != $expected")
    }
  }

  test("half-open semantics: hi is excluded, lo included") {
    val got = RangeJoin.pointInInterval(points, col("x"), intervals,
        col("lo"), col("hi"), bucketWidth = 10.0)
      .select("pid", "iv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((4L, 0L)), "x=40.0 in [0,60)")
    assert(got.contains((4L, 1L)), "x=40.0 at lo of [40,100) included")
    assert(!got.contains((6L, 0L)), "x=60.0 at hi of [0,60) excluded")
    assert(!got.exists(_._1 == 8L), "x=250 matches nothing")
  }

  test("plans as an equi join on the bucket key, not a nested loop") {
    val out = RangeJoin.pointInInterval(points, col("x"), intervals,
      col("lo"), col("hi"), bucketWidth = 25.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"plan:\n$plan")
  }
}
