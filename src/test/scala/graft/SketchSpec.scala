package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pins the approximate-sketch surface (the 100 TB substitutes for exact
  * distinct counts and exact percentiles): HyperLogLog++ distinct counts
  * and GK approximate percentiles land within their declared error bounds
  * of the exact answers on the testdata. Sketches are approximate →
  * spec-pinned against exact, not oracle-hash-checked. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct (HLL++) is within rsd of the exact count") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    // 0.02 is one sigma; 5x gives a deterministic-data margin
    assert(err <= 0.10, s"exact=$exact approx=$approx err=$err")
  }

  test("HLL sketches merge across groups (partial aggregation shape)") {
    val li = Tables.lineitem(spark, sf)
    // group-then-global must agree with direct global estimation exactly:
    // both plans merge the same per-partition HLL buffers
    val direct = li.select(approx_count_distinct(col("l_partkey")).as("d"))
      .collect().head.getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    assert(math.abs(direct - exact).toDouble / exact < 0.10)
  }

  test("percentile_approx brackets the exact interpolated percentile") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(percentile(col("l_extendedprice"), lit(0.5)))
      .collect().head.getDouble(0)
    val approx = li.select(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .collect().head.getDouble(0)
    // accuracy 10000 -> rank error <= n/10000; price range at sf0.001 is
    // wide, allow 2% relative value error
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }
}
