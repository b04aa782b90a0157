package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Dedup}

class AsOfClusterSpec extends SparkSpec {
  import spark.implicits._

  test("resolveClusters: chain and separate components get min-id labels") {
    // components: {1,2,3,4} (chain) and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("resolveClusters handles a long path (propagation iterates)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getAs[Long]("cluster")).distinct
    assert(got.toSeq == Seq(1L))
  }

  test("distributed propagation path agrees with driver union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val driver = Dedup.resolveClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dist = Dedup.resolveClusters(pairs, driverThreshold = 0L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cluster"))).sorted.toSeq
    assert(driver == dist)
  }

  test("asof join picks the most recent prior right row, ties included") {
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (100L, 1L, t("2024-01-01 10:00:00")),  // after views at 9 and 9:30 -> 2.0
      (101L, 1L, t("2024-01-01 09:30:00")),  // exactly at a view -> 2.0 (>=)
      (102L, 1L, t("2024-01-01 08:00:00")),  // before any view -> null
      (103L, 2L, t("2024-01-01 10:00:00")))  // other user, one view -> 7.0
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, t("2024-01-01 09:00:00"), 1.0),
      (1L, t("2024-01-01 09:30:00"), 2.0),
      (2L, t("2024-01-01 09:59:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val got = AsOf.join(left, right, "user_id", "ts", col("value"), "v")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toMap
    assert(got == Map(100L -> Some(2.0), 101L -> Some(2.0),
      102L -> None, 103L -> Some(7.0)))
  }

  test("forward asof join picks the earliest following right row, ties included") {
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (100L, 1L, t("2024-01-01 08:00:00")),  // before views at 9 and 9:30 -> 1.0
      (101L, 1L, t("2024-01-01 09:30:00")),  // exactly at a view -> 2.0 (<=)
      (102L, 1L, t("2024-01-01 10:00:00")),  // after every view -> null
      (103L, 2L, t("2024-01-01 09:00:00")))  // other user, one later view -> 7.0
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, t("2024-01-01 09:00:00"), 1.0),
      (1L, t("2024-01-01 09:30:00"), 2.0),
      (2L, t("2024-01-01 09:59:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val got = AsOf.joinForward(left, right, "user_id", "ts", col("value"), "v")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toMap
    assert(got == Map(100L -> Some(1.0), 101L -> Some(2.0),
      102L -> None, 103L -> Some(7.0)))
  }
}
