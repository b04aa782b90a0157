package graft

import graft.queries.AdvancedQueries

class AdvancedQueriesSpec extends SparkSpec {

  test("every advanced query runs and returns rows at sf0.001") {
    AdvancedQueries.all.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every advanced query has a DuckDB oracle") {
    assert(AdvancedQueries.oracle.keySet == AdvancedQueries.all.keySet)
  }

  test("q50 cube emits all four aggregation levels") {
    val gids = AdvancedQueries.q50Cube(spark, sf).collect()
      .map(_.getAs[Int]("gid")).toSet
    assert(gids == Set(0, 1, 2, 3))
  }

  test("q53 emits at most 3 rows per brand, ranked by price desc") {
    val rows = AdvancedQueries.q53TopNPerGroup(spark, sf).collect()
    val perBrand = rows.groupBy(_.getAs[String]("p_brand"))
    assert(perBrand.values.forall(_.length <= 3))
    perBrand.values.foreach { rs =>
      val prices = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("p_retailprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q48 quartiles partition each segment's customers") {
    val rows = AdvancedQueries.q48Ntile(spark, sf).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.foreach { case (seg, rs) =>
      assert(rs.map(_.getAs[Int]("quartile")).toSet == Set(1, 2, 3, 4), s"segment $seg")
      // ntile balance: sizes differ by at most 1
      val ns = rs.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"segment $seg sizes $ns")
    }
  }
}
