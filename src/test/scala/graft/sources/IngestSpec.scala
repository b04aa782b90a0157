package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.traffic.{Normalize, TrafficFixture, TrafficRecord}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("accumulatePages unions heterogeneous pages (G68)") {
    val p1 = Seq(("1", "Queens")).toDF("requestid", "boro")
    val p2 = Seq(("2", "10")).toDF("requestid", "vol") // late page, new key
    val all = Ingest.accumulatePages(Seq(p1, p2))
    assert(all.count() == 2)
    assert(all.columns.toSet == Set("requestid", "boro", "vol"))
    assert(all.where(col("vol").isNull).count() == 1)
  }

  test("land writes year-partitioned parquet and predicates prune partitions") {
    val dir = Files.createTempDirectory("landing").toString
    val norm = Normalize(TrafficFixture.raw(spark, 300))
    Ingest.land(norm, dir, targetFileParallelism = 2)
    val back = spark.read.parquet(dir)
    assert(back.count() == norm.count())
    // partition pruning: a year filter must appear as PartitionFilters
    val plan = back.filter(col("year") === 2024).queryExecution
      .executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("year"), s"plan:\n$plan")
    val pruned = back.filter(col("year") === 2024).count()
    assert(pruned == norm.filter(col("year") === 2024).count())
  }

  test("typed facade: Dataset[TrafficRecord] round-trips fields") {
    implicit val s = spark
    val ds = TrafficRecord.typed(Normalize(TrafficFixture.raw(spark, 50)))
    val r = ds.filter(_.request_id.contains("0")).head()
    assert(r.borough.contains("Queens"))
    assert(r.volume.isDefined && r.date.isDefined)
    // typed filter + map compile and run
    val weekendCount = ds.filter(_.is_weekend.contains(1)).count()
    assert(weekendCount >= 0)
  }
}
