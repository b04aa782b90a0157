package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GroupTopK
import graft.sources.Tables

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("custom top-k operator equals the row_number window formulation") {
    val part = Tables.part(spark, sf)
    val viaWindow = part
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_brand"))
          .orderBy(desc("p_retailprice"), asc("p_partkey"))))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaOperator = GroupTopK.topK(part,
        Seq(col("p_brand")),
        Seq(col("p_retailprice").desc, col("p_partkey").asc), 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaOperator == viaWindow)
  }

  test("plans as partial/final with one exchange and no sort") {
    val df = GroupTopK.topK(Tables.part(spark, sf),
      Seq(col("p_brand")), Seq(col("p_retailprice").desc, col("p_partkey")), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), s"plan:\n$plan")
    assert(plan.contains("TopKPerGroupFinal"), s"plan:\n$plan")
    assert(!plan.contains("SortExec") && !plan.toLowerCase.contains("\nsort"),
      s"no sort expected:\n$plan")
  }

  test("k larger than any group returns everything; k=1 returns group argmax") {
    val df = Seq((1, "a", 10), (2, "a", 20), (3, "b", 5))
      .toDF("id", "g", "v").repartition(3)
    val all = GroupTopK.topK(df, Seq(col("g")), Seq(col("v").desc), 100)
    assert(all.count() == 3)
    val arg = GroupTopK.topK(df, Seq(col("g")), Seq(col("v").desc), 1)
      .collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    assert(arg == Map("a" -> 2, "b" -> 3))
  }

  test("global top-k (no group columns) works") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37) % 101)).toDF("id", "v")
      .repartition(5)
    val got = GroupTopK.topK(df, Seq.empty, Seq(col("v").desc, col("id")), 5)
      .select("v").collect().map(_.getInt(0)).sorted.reverse.toSeq
    val want = df.select("v").collect().map(_.getInt(0)).sorted.reverse.take(5).toSeq
    assert(got == want)
  }
}
