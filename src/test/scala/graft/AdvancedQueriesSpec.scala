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

  test("q103's JSON extraction: decade buckets, NULL bucket for bad props") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("""{"k": 42}""", """{"k": 7}""", """{"k": -7}""", """{}""",
      "not json", null.asInstanceOf[String]).toDF("props")
    val k = get_json_object(col("props"), "$.k").cast("int")
    val got = df.select((k - (k % lit(10))).as("k_bucket"))
      .groupBy("k_bucket").count().collect()
      .map(r => (if (r.isNullAt(0)) -999 else r.getInt(0)) -> r.getLong(1))
      .toMap
    // 42 -> 40, 7 -> 0; -7 -> 0 too: the TRUNCATING remainder matches
    // DuckDB's % (pmod would send -7 to bucket -10 on Spark only);
    // empty object, garbage, and null all land in the NULL bucket
    // instead of vanishing.
    assert(got == Map(40 -> 1L, 0 -> 2L, -999 -> 3L))
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
