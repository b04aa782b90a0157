package graft

import org.apache.spark.sql.Row

import graft.queries.CoreQueries

class CoreQueriesSpec extends SparkSpec {

  test("every declared query runs and returns rows at sf0.001") {
    CoreQueries.all.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has a DuckDB oracle") {
    assert(CoreQueries.oracle.keySet == CoreQueries.all.keySet)
  }

  test("q1 returns exactly 10 suppliers ordered by revenue desc") {
    val rows = CoreQueries.q1TopSuppliers(spark, sf).collect()
    assert(rows.length == 10)
    val sums = rows.map(_.getDouble(rows.head.fieldIndex("sum_price")))
    assert(sums.zip(sums.tail).forall { case (a, b) => a >= b })
  }

  test("q7 unmapped code N maps to null label (F53 semantics)") {
    val labels = CoreQueries.q7LabelMap(spark, sf).collect()
      .map(r => Option(r.getAs[String]("label"))).toSet
    assert(labels.contains(None), "expected a null label group for 'N'")
    assert(labels.flatten == Set("refused", "returned"))
  }

  test("q8 bins are half-open [0,50k),[50k,200k),[200k,inf) (F55 semantics)") {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sf)
    val bins = CoreQueries.q8PriceBins(spark, sf).collect()
      .map(r => r.getAs[String]("bin") -> r.getAs[Long]("n")).toMap
    val low = orders.filter(col("o_totalprice") >= 0 && col("o_totalprice") < 50000).count()
    val med = orders.filter(col("o_totalprice") >= 50000 && col("o_totalprice") < 200000).count()
    assert(bins.getOrElse("low", 0L) == low)
    assert(bins.getOrElse("medium", 0L) == med)
  }

  test("q9 peak flag: flagged fraction is roughly a quarter") {
    val rows = CoreQueries.q9PeakFlag(spark, sf).collect()
      .map(r => r.getAs[Int]("is_peak") -> r.getAs[Long]("n")).toMap
    val total = rows.values.sum.toDouble
    val frac = rows.getOrElse(1, 0L) / total
    assert(frac > 0.15 && frac < 0.40, s"peak fraction $frac not ~0.25")
  }

  test("q17 semi+anti partition the customer table") {
    val rows = CoreQueries.q17SemiAnti(spark, sf).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("cnt")).toMap
    val total = graft.sources.Tables.customer(spark, sf).count()
    assert(rows("with_orders") + rows("without_orders") == total)
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
