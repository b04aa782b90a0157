package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The declared correctness query set Q1–Q17 (SURVEY.md §5.2): each is the
  * testdata transliteration of a reference analysis
  * (TrafficAnalysis.py / Dash.py / proto/TrafficAnalysis_Hist.py), expressed
  * Spark-first over the TPC-H-ish driver testdata.
  *
  * Cross-engine float determinism (the driver hash-compares our parquet
  * against DuckDB running [[graft.SparkEntry.oracleSql]]):
  *   - money sums: `round(sum(x), 2)` — the true total sits on the 2-decimal
  *     grid and accumulated FP error is ~1e-8, so both engines land on the
  *     identical double.
  *   - averages: `round(sum(x),2) / count` — an IEEE division of two exact
  *     values is bit-identical everywhere; a direct `round(avg(x),2)` can sit
  *     exactly on a .xx5 rounding boundary (sum/count is rational) where
  *     Spark (HALF_UP on decimal string) and DuckDB (scaled double round)
  *     disagree.
  *   - stddev/corr: rounded (2/4 dp); results are irrational-ish so the
  *     probability of straddling a rounding boundary is negligible.
  *   - thresholds (percentile, μ±3σ) are compared against data, never output.
  *
  * Every query carries a total ORDER BY (deterministic tie-breakers) so the
  * Spark result and the DuckDB oracle agree row-for-row (SURVEY.md §7.4.5).
  */
object CoreQueries {

  /** Money aggregate: exact on the 2-decimal grid in both engines. */
  private def moneySum(c: Column): Column = round(sum(c), 2)

  /** Bit-reproducible mean: exact-total / exact-count. */
  private def moneyAvg(c: Column): Column = round(sum(c), 2) / count(c)

  /** Q1 — group-sum+avg, top-10 (reference: "busiest streets", TA:265-281,
    * D26/E44): per-supplier revenue, top 10 with deterministic tie-break.
    * Spark plans this as partial+final HashAggregate then
    * TakeOrderedAndProject — per-partition top-k, no full sort at scale. */
  def q1TopSuppliers(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(
        moneySum(col("l_extendedprice")).as("sum_price"),
        moneyAvg(col("l_extendedprice")).as("avg_price"))
      .orderBy(desc("sum_price"), asc("l_suppkey"))
      .limit(10)

  /** Q2 — group-sum by category (reference: "traffic by borough", TA:226-240,
    * D24): order totals per priority. */
  def q2ByPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderpriority"))

  /** Q3 — group-sum by date (reference: "traffic over time", TA:283-303, D27). */
  def q3ByDate(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("order_date"))

  /** Q4 — top-10 dates (reference: "busiest dates", TA:305-325, E44). */
  def q4TopDates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(desc("sum_price"), asc("order_date"))
      .limit(10)

  /** Q5 — group-sum by hour (reference: "peak hours", TA:328-349, D28/D30). */
  def q5ByHour(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .orderBy(asc_nulls_first("hr"))

  /** Q6 — filter + latest-day slice (reference: dashboard hourly chart,
    * DA:207-215, C19/C20/D30): clicks on the most recent click day, by hour.
    * The scalar max-date is a 1-row broadcast cross join — no shuffle of the
    * fact side beyond the final tiny aggregation. */
  def q6LatestDayClicks(spark: SparkSession, dir: String): DataFrame = {
    val clicks = Tables.events(spark, dir)
      .filter(col("event_type") === lit("click"))
    val maxDay = clicks.agg(max(to_date(col("ts"))).as("max_day"))
    clicks.crossJoin(broadcast(maxDay))
      .filter(to_date(col("ts")) === col("max_day"))
      .groupBy(hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
      .orderBy(asc_nulls_first("hr"))
  }

  /** Q7 — code→label map with unmapped→null (reference: direction labels,
    * TA:244-262, F53/D25): l_returnflag A→returned, R→refused, N unmapped. */
  def q7LabelMap(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("label",
        when(col("l_returnflag") === "A", lit("returned"))
          .when(col("l_returnflag") === "R", lit("refused"))
          .otherwise(lit(null)))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("label"))

  /** Q8 — value binning, half-open bins (reference: Low/Medium/High traffic,
    * TA:352-356, F55): pd.cut(right=False) semantics — [0,50k) low,
    * [50k,200k) medium, [200k,∞) high, out-of-range (<0) and null → null. */
  def q8PriceBins(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bin",
        when(col("o_totalprice").isNull || col("o_totalprice") < 0, lit(null))
          .when(col("o_totalprice") < 50000, lit("low"))
          .when(col("o_totalprice") < 200000, lit("medium"))
          .otherwise(lit("high")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("bin"))

  /** Q9 — quantile-threshold flag (reference: "is_peak_hour", TA:383-386,
    * C22/D35): exact interpolated percentile(0.75), as pandas quantile. */
  def q9PeakFlag(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val thr = li.agg(percentile(col("l_quantity"), lit(0.75)).as("p75"))
    li.crossJoin(broadcast(thr))
      .withColumn("is_peak", when(col("l_quantity") >= col("p75"), 1).otherwise(0))
      .groupBy(col("is_peak"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("is_peak"))
  }

  /** Q10 — 3σ outlier flag (reference: "abnormal traffic", TA:408-413, C21):
    * null value compares to null → flagged 0, matching pandas NaN>x=False. */
  def q10Outliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.agg(
      avg(col("value")).as("mu"),
      stddev_samp(col("value")).as("sigma"))
    ev.crossJoin(broadcast(stats))
      .withColumn("is_abnormal",
        when(col("value") > col("mu") + lit(3) * col("sigma") ||
             col("value") < col("mu") - lit(3) * col("sigma"), 1).otherwise(0))
      .groupBy(col("is_abnormal"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("is_abnormal"))
  }

  /** Q11 — summary stats (reference: describe(), TA:109-117, D34/D36). */
  def q11Stats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        count(col("l_extendedprice")).as("n"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  /** Q12 — Pearson correlation (reference: heatmap, TA:130-143, D37). */
  def q12Corr(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r"))

  /** Q13 — unpivot + argmax-per-key (reference: per-street peak hour over the
    * wide hourly table, proto:203-210, G67/D33): per return flag, which
    * measure has the largest total. The reference's one window-shaped
    * computation → row_number over a 12-row aggregate (window input is tiny
    * because aggregation happens FIRST — at 100 TB the window never sees raw
    * rows). */
  def q13UnpivotArgmax(spark: SparkSession, dir: String): DataFrame = {
    val sums = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        moneySum(col("l_quantity")).as("quantity"),
        moneySum(col("l_extendedprice")).as("extendedprice"),
        moneySum(col("l_discount")).as("discount"),
        moneySum(col("l_tax")).as("tax"))
    val long = sums.unpivot(
      Array(col("l_returnflag")),
      Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
      "measure", "total")
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(desc("total"), asc("measure"))
    long.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("measure"), col("total"))
      .orderBy(asc_nulls_first("l_returnflag"))
  }

  /** Q14 — distinct (reference: street dropdown, DA:89, D39). */
  def q14Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"))
      .distinct()
      .orderBy(asc_nulls_first("o_orderstatus"))

  /** Q15 — lenient extraction + null fill (reference: to_numeric(coerce) +
    * fillna, TA:104-107 / DA:53, B12/F57): pull `k` out of the JSON props,
    * null on junk, fill −1, count per k. */
  def q15JsonNullFill(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k",
        coalesce(get_json_object(col("props"), "$.k").try_cast("int"), lit(-1)))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("k"))

  /** Q16 — star join (beyond reference, demanded by the testdata star schema):
    * orders⋈customer⋈nation revenue per nation. `nation` (25 rows) is
    * broadcast; orders⋈customer is a shuffle join at scale (AQE may still
    * broadcast customer at small SF). */
  def q16JoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("n_name"))

  /** Q17 — semi/anti join: customers with vs without orders. */
  def q17SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).withColumn("kind", lit("with_orders"))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).withColumn("kind", lit("without_orders"))
    withOrders.unionByName(withoutOrders)
      .select(col("kind"), col("cnt"))
      .orderBy(asc_nulls_first("kind"))
  }

  /** Name → builder, consumed by [[graft.SparkEntry]]. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_top_suppliers"     -> q1TopSuppliers _,
    "q2_by_priority"       -> q2ByPriority _,
    "q3_by_date"           -> q3ByDate _,
    "q4_top_dates"         -> q4TopDates _,
    "q5_by_hour"           -> q5ByHour _,
    "q6_latest_day_clicks" -> q6LatestDayClicks _,
    "q7_label_map"         -> q7LabelMap _,
    "q8_price_bins"        -> q8PriceBins _,
    "q9_peak_flag"         -> q9PeakFlag _,
    "q10_outliers"         -> q10Outliers _,
    "q11_stats"            -> q11Stats _,
    "q12_corr"             -> q12Corr _,
    "q13_unpivot_argmax"   -> q13UnpivotArgmax _,
    "q14_distinct"         -> q14Distinct _,
    "q15_json_null_fill"   -> q15JsonNullFill _,
    "q16_join_agg"         -> q16JoinAgg _,
    "q17_semi_anti"        -> q17SemiAnti _,
  )

  /** DuckDB oracle SQL, same result column names and ORDER BY as the Spark
    * builders (the driver sorts columns by name then hashes values). */
  val oracle: Map[String, String] = Map(
    "q1_top_suppliers" ->
      """SELECT l_suppkey, round(sum(l_extendedprice),2) AS sum_price,
        | round(sum(l_extendedprice),2)/count(l_extendedprice) AS avg_price
        | FROM lineitem GROUP BY l_suppkey
        | ORDER BY sum_price DESC, l_suppkey LIMIT 10""".stripMargin,
    "q2_by_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS sum_price
        | FROM orders GROUP BY o_orderpriority
        | ORDER BY o_orderpriority NULLS FIRST""".stripMargin,
    "q3_by_date" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_date,
        | round(sum(o_totalprice),2) AS sum_price
        | FROM orders GROUP BY order_date ORDER BY order_date NULLS FIRST""".stripMargin,
    "q4_top_dates" ->
      """SELECT CAST(o_orderdate AS DATE) AS order_date,
        | round(sum(o_totalprice),2) AS sum_price
        | FROM orders GROUP BY order_date
        | ORDER BY sum_price DESC, order_date LIMIT 10""".stripMargin,
    "q5_by_hour" ->
      """SELECT CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n,
        | round(sum(value),2) AS sum_value
        | FROM events GROUP BY hr ORDER BY hr NULLS FIRST""".stripMargin,
    "q6_latest_day_clicks" ->
      """SELECT CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n,
        | round(sum(value),2) AS sum_value
        | FROM events
        | WHERE event_type = 'click'
        |   AND CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events
        |                           WHERE event_type = 'click')
        | GROUP BY hr ORDER BY hr NULLS FIRST""".stripMargin,
    "q7_label_map" ->
      """SELECT CASE WHEN l_returnflag = 'A' THEN 'returned'
        |             WHEN l_returnflag = 'R' THEN 'refused' END AS label,
        | count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        | FROM lineitem GROUP BY label ORDER BY label NULLS FIRST""".stripMargin,
    "q8_price_bins" ->
      """SELECT CASE WHEN o_totalprice IS NULL OR o_totalprice < 0 THEN NULL
        |             WHEN o_totalprice < 50000 THEN 'low'
        |             WHEN o_totalprice < 200000 THEN 'medium'
        |             ELSE 'high' END AS bin,
        | count(*) AS n, round(sum(o_totalprice),2) AS sum_price
        | FROM orders GROUP BY bin ORDER BY bin NULLS FIRST""".stripMargin,
    "q9_peak_flag" ->
      """SELECT CASE WHEN l_quantity >=
        |   (SELECT quantile_cont(l_quantity, 0.75) FROM lineitem)
        |   THEN 1 ELSE 0 END AS is_peak,
        | count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        | FROM lineitem GROUP BY is_peak ORDER BY is_peak NULLS FIRST""".stripMargin,
    "q10_outliers" ->
      """WITH s AS (SELECT avg(value) AS mu, stddev_samp(value) AS sigma
        |           FROM events)
        |SELECT CASE WHEN value > mu + 3*sigma OR value < mu - 3*sigma
        |            THEN 1 ELSE 0 END AS is_abnormal, count(*) AS n
        | FROM events, s GROUP BY is_abnormal
        | ORDER BY is_abnormal NULLS FIRST""".stripMargin,
    "q11_stats" ->
      """SELECT count(l_extendedprice) AS n,
        | round(sum(l_extendedprice),2)/count(l_extendedprice) AS avg_price,
        | round(stddev_samp(l_extendedprice),2) AS sd_price,
        | min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price
        | FROM lineitem""".stripMargin,
    "q12_corr" ->
      "SELECT round(corr(l_quantity, l_extendedprice),4) AS r FROM lineitem",
    "q13_unpivot_argmax" ->
      """WITH sums AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity),2) AS quantity,
        |    round(sum(l_extendedprice),2) AS extendedprice,
        |    round(sum(l_discount),2) AS discount,
        |    round(sum(l_tax),2) AS tax
        |  FROM lineitem GROUP BY l_returnflag),
        | long AS (
        |  SELECT l_returnflag, 'quantity' AS measure, quantity AS total FROM sums
        |  UNION ALL SELECT l_returnflag, 'extendedprice', extendedprice FROM sums
        |  UNION ALL SELECT l_returnflag, 'discount', discount FROM sums
        |  UNION ALL SELECT l_returnflag, 'tax', tax FROM sums),
        | ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY total DESC, measure) AS rn FROM long)
        |SELECT l_returnflag, measure, total FROM ranked WHERE rn = 1
        | ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q14_distinct" ->
      """SELECT DISTINCT o_orderstatus FROM orders
        | ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
    "q15_json_null_fill" ->
      """SELECT coalesce(TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
        |   AS INTEGER), -1) AS k, count(*) AS n
        | FROM events GROUP BY k ORDER BY k NULLS FIRST""".stripMargin,
    "q16_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS sum_price
        | FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name ORDER BY n_name NULLS FIRST""".stripMargin,
    "q17_semi_anti" ->
      """SELECT 'with_orders' AS kind, count(*) AS cnt FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS kind, count(*) AS cnt FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY kind NULLS FIRST""".stripMargin,
  )
}
