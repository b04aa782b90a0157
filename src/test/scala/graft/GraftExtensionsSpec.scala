package graft

class GraftExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  simhash64(array('a','b','c')) AS sh,
        |  size(minhash_sig(array('a','b'), 16)) AS k,
        |  float_vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                array(cast(3.0 as float), cast(4.0 as float))) AS dot,
        |  round(epsg2263_to_wgs84(997407.0998d, 208620.9261d)[1], 3) AS lat
        |""".stripMargin).collect().head
    assert(r.getAs[Int]("k") == 16)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(math.abs(r.getAs[Double]("lat") - 40.744) < 0.01)
    // simhash is deterministic across invocations
    val again = spark.sql("SELECT simhash64(array('a','b','c'))").collect().head.getLong(0)
    assert(again == r.getAs[Long]("sh"))
  }

  test("registerViews exposes the tables + functions to spark.sql") {
    graft.sources.Tables.registerViews(spark, sf)
    val r = spark.sql(
      """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS s
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(r.length == 3)
    val sim = spark.sql(
      """SELECT count(*) FROM documents
        |WHERE simhash64(split(lower(trim(text)), '\\s+')) IS NOT NULL""".stripMargin)
      .collect().head.getLong(0)
    assert(sim == 500)
    val hr = spark.sql("SELECT max(hour(ts)) FROM events").collect().head.getInt(0)
    assert(hr == 23)
  }

  test("round-12 registrations: nfc_normalize and zorder_key from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT nfc_normalize('café') AS canon,
        |       zorder_key(3L, 5L, 16) AS z,
        |       zorder_key(-1L, 5L, 16) AS oob""".stripMargin)
      .collect().head
    assert(r.getString(0) == "caf\u00e9", "decomposed e+U+0301 must compose to U+00E9")
    // 3 = 0b011 on even bits, 5 = 0b101 on odd bits:
    // z = (1<<0)+(1<<2) + (1<<1)+(1<<5) = 0b100111 = 39
    assert(r.getLong(1) == 39L)
    assert(r.isNullAt(2), "out-of-range input must be NULL")
  }

  test("identical token bags give identical simhash via SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('x','y')) = simhash64(array('x','y')) AS eq,
        |       simhash64(array('x','y')) = simhash64(array('p','q')) AS neq""".stripMargin)
      .collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
