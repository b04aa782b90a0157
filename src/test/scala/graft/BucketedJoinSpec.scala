package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing as the co-located-join lever (SCALE.md): writing both
  * join sides bucketed on the key lets the join read bucket-aligned
  * files with NO shuffle exchange on either side — the storage-layout
  * answer to a join that repeats every run (the 100 TB fact/dim case
  * where re-shuffling the fact table per query is the dominant cost).
  * Broadcast is disabled in the test so the no-exchange plan is
  * genuinely the bucket co-location, not a small-side shortcut; the
  * result is pinned equal to the plain shuffled join. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketBy(8, key) on both sides: SortMergeJoin with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice"))
    val su = Tables.supplier(spark, sf)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_supp_bucketed")
    li.write.bucketBy(8, "l_suppkey").mode("overwrite")
      .saveAsTable("graft_li_bucketed")
    su.write.bucketBy(8, "l_suppkey").mode("overwrite")
      .saveAsTable("graft_supp_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_li_bucketed")
        .join(spark.table("graft_supp_bucketed"), "l_suppkey")
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_extendedprice"), col("s_name"))
      val rows = j.collect() // execute so AQE finalizes the plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // layout must be semantically invisible: equal to the plain join
      val plain = li.join(su, "l_suppkey")
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_extendedprice"), col("s_name"))
        .collect()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
      assert(rows.map(key).sortBy(_.toString).toSeq ==
        plain.map(key).sortBy(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_supp_bucketed")
    }
  }
}
