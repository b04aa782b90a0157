package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.traffic.{Normalize, WideTable}

/** Scalar-function / reshaping reference-parity queries over the testdata
  * (SURVEY.md §2.F/§2.G transliterations) — each exercises a traffic-
  * library operator through the oracle gate: weekday/weekend (F49/F50),
  * ISO weeks (F51), one-hot (F56), category codes (F54), histograms
  * (D42), min-max normalization (F59), windowed running totals, pivot
  * (I77 confusion-matrix shape). */
object FunctionQueries {

  /** q28 — weekday (Monday=0) + weekend flag per order date. */
  def q28Weekday(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("dow", weekday(to_date(col("o_orderdate"))))
      .withColumn("is_weekend", when(col("dow") >= 5, 1).otherwise(0))
      .groupBy(col("dow"), col("is_weekend"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("dow"))

  /** q29 — ISO week-of-year distribution. */
  def q29WeekOfYear(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(weekofyear(to_date(col("o_orderdate"))).as("week"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("week"))

  /** q30 — one-hot encoding of order priority, column sums (pandas
    * get_dummies → sum; exercises Normalize.oneHot end-to-end). */
  def q30OneHot(spark: SparkSession, dir: String): DataFrame = {
    val oh = Normalize.oneHot(Tables.orders(spark, dir), "o_orderpriority")
    oh.agg(
      sum(col("o_orderpriority_1-URGENT")).as("oh_urgent"),
      sum(col("o_orderpriority_2-HIGH")).as("oh_high"),
      sum(col("o_orderpriority_3-MEDIUM")).as("oh_medium"),
      sum(col("o_orderpriority_4-NOT SPECIFIED")).as("oh_notspec"),
      sum(col("o_orderpriority_5-LOW")).as("oh_low"))
  }

  /** q31 — pandas cat.codes: dense codes by sorted distinct value. */
  def q31CategoryCodes(spark: SparkSession, dir: String): DataFrame =
    Normalize.categoryCodes(Tables.orders(spark, dir), "o_orderstatus", "code")
      .groupBy(col("o_orderstatus"), col("code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"))

  /** q32 — 20-bin fixed-width histogram of order totals. */
  def q32Histogram(spark: SparkSession, dir: String): DataFrame =
    WideTable.histogram(Tables.orders(spark, dir), "o_totalprice", 20)

  /** q33 — min-max normalize quantity, per-flag normalized mass. */
  def q33MinMaxNorm(spark: SparkSession, dir: String): DataFrame =
    Normalize.minMaxNormalize(Tables.lineitem(spark, dir), Seq("l_quantity"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_norm"), count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"))

  /** q34 — daily totals + running cumulative sum (window over exact
    * 2-decimal dailies → cross-engine exact). The unpartitioned window
    * (Spark logs a single-partition warning) is deliberate and safe at
    * any corpus scale: its input is POST-aggregation, one row per
    * calendar date — bounded by the calendar, not the data. Unbounded
    * row-per-record cumsums use ScalableWindow's two-phase form (q39). */
  def q34RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(round(sum(col("o_totalprice")), 2).as("sum_price"))
    val w = Window.orderBy(asc("order_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // DuckDB evaluates window sums with a segment tree (pairwise adds),
    // Spark sequentially — rounding re-lands both on the 2-decimal grid.
    daily.withColumn("cum_price", round(sum(col("sum_price")).over(w), 2))
      .orderBy(asc_nulls_first("order_date"))
  }

  /** q35 — status × priority contingency table (groupBy + pivot + count,
    * the reference's confusion-matrix shape). */
  def q35Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority")
      .count()
      .na.fill(0)
      .orderBy(asc_nulls_first("o_orderstatus"))

  /** q41 — hierarchical subtotals via ROLLUP (status → status×priority →
    * grand total); beyond the reference, supplied by Catalyst's grouping
    * sets (SURVEY §2.D note). */
  def q41Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** q42 — distinct aggregates: per return flag, exact distinct supplier
    * and part counts alongside plain counts (expand-based distinct agg). */
  def q42DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"))

  /** q44 — batch event-time bucketing: hourly tumbling windows over the
    * events stream table (batch analog of the streaming windowed
    * aggregation; `window()` in a plain groupBy). */
  def q44TimeBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("n"), col("sum_value"))
      .orderBy(asc_nulls_first("bucket_start"))

  /** q45 — batch sessionization: per-user sessions split on >30 min
    * event-time gaps via lag + running boundary count (the batch analog
    * of the streaming flatMapGroupsWithState sessionizer); reports
    * session-count and size distribution per user bucket. */
  def q45Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val sessions = graft.operators.Funnel.sessionize(
        Tables.events(spark, dir), col("user_id"), col("ts"),
        gapMicros = 30L * 60L * 1000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("n_events_total"))
      .orderBy(asc_nulls_first("user_id"))
  }

  /** q158 — referential-integrity audit ([[graft.operators.CorpusStats
    * .referentialAudit]]) over the warehouse's declared foreign keys:
    * per constraint, row/null/distinct/orphan evidence from key-level
    * frames (the child collapses to its key profile before any join,
    * so the membership probe runs at key cardinality — dimension-sized
    * parents broadcast under AQE). A clean warehouse audits to zero
    * orphans; the operator's value is that the zero is MEASURED. */
  def q158IntegrityAudit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.referentialAudit(Seq(
        ("lineitem.l_orderkey->orders", Tables.lineitem(spark, dir),
          col("l_orderkey"), Tables.orders(spark, dir), col("o_orderkey")),
        ("lineitem.l_partkey->part", Tables.lineitem(spark, dir),
          col("l_partkey"), Tables.part(spark, dir), col("p_partkey")),
        ("lineitem.l_suppkey->supplier", Tables.lineitem(spark, dir),
          col("l_suppkey"), Tables.supplier(spark, dir), col("s_suppkey")),
        ("orders.o_custkey->customer", Tables.orders(spark, dir),
          col("o_custkey"), Tables.customer(spark, dir), col("c_custkey"))))
      .orderBy(asc("fk_name"))

  /** q166 — join fan-out profile ([[graft.operators.CorpusStats
    * .fanoutProfile]]): the degree distribution of each declared
    * foreign key (exact interpolated p50/p90/p99, max) — the number
    * that predicts join blow-up before the join runs; q158 says the
    * keys resolve, this says what joining them costs. */
  def q166JoinFanout(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.fanoutProfile(Seq(
        ("lineitem.l_orderkey->orders", Tables.lineitem(spark, dir),
          col("l_orderkey")),
        ("orders.o_custkey->customer", Tables.orders(spark, dir),
          col("o_custkey"))))
      .orderBy(asc("fk_name"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_integrity_audit" -> q158IntegrityAudit _,
    "q166_join_fanout"     -> q166JoinFanout _,
    "q28_weekday"       -> q28Weekday _,
    "q29_weekofyear"    -> q29WeekOfYear _,
    "q30_onehot"        -> q30OneHot _,
    "q31_catcodes"      -> q31CategoryCodes _,
    "q32_histogram"     -> q32Histogram _,
    "q33_minmax_norm"   -> q33MinMaxNorm _,
    "q34_running_total" -> q34RunningTotal _,
    "q35_pivot"         -> q35Pivot _,
    "q41_rollup"        -> q41Rollup _,
    "q42_distinct_agg"  -> q42DistinctAgg _,
    "q44_time_buckets"  -> q44TimeBuckets _,
    "q45_sessionize"    -> q45Sessionize _,
  )

  val oracle: Map[String, String] = Map(
    "q166_join_fanout" ->
      """WITH d1 AS (SELECT l_orderkey AS k, count(*) AS d FROM lineitem
        |   WHERE l_orderkey IS NOT NULL GROUP BY 1),
        | d2 AS (SELECT o_custkey AS k, count(*) AS d FROM orders
        |   WHERE o_custkey IS NOT NULL GROUP BY 1)
        |SELECT 'lineitem.l_orderkey->orders' AS fk_name,
        |  count(*) AS n_parents,
        |  CAST(coalesce(sum(d), 0) AS BIGINT) AS n_children,
        |  round(CAST(sum(d) AS DOUBLE) / count(*), 4) AS mean_degree,
        |  round(quantile_cont(d, 0.5), 4) AS p50,
        |  round(quantile_cont(d, 0.9), 4) AS p90,
        |  round(quantile_cont(d, 0.99), 4) AS p99,
        |  max(d) AS max_degree
        | FROM d1
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', count(*),
        |  CAST(coalesce(sum(d), 0) AS BIGINT),
        |  round(CAST(sum(d) AS DOUBLE) / count(*), 4),
        |  round(quantile_cont(d, 0.5), 4), round(quantile_cont(d, 0.9), 4),
        |  round(quantile_cont(d, 0.99), 4), max(d)
        | FROM d2
        |ORDER BY fk_name""".stripMargin,
    "q158_integrity_audit" ->
      """WITH a1 AS (SELECT g.k, g.cnt, p.pk FROM
        |   (SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem
        |    GROUP BY 1) g
        |   LEFT JOIN (SELECT DISTINCT o_orderkey AS pk FROM orders) p
        |     ON g.k = p.pk),
        | a2 AS (SELECT g.k, g.cnt, p.pk FROM
        |   (SELECT l_partkey AS k, count(*) AS cnt FROM lineitem
        |    GROUP BY 1) g
        |   LEFT JOIN (SELECT DISTINCT p_partkey AS pk FROM part) p
        |     ON g.k = p.pk),
        | a3 AS (SELECT g.k, g.cnt, p.pk FROM
        |   (SELECT l_suppkey AS k, count(*) AS cnt FROM lineitem
        |    GROUP BY 1) g
        |   LEFT JOIN (SELECT DISTINCT s_suppkey AS pk FROM supplier) p
        |     ON g.k = p.pk),
        | a4 AS (SELECT g.k, g.cnt, p.pk FROM
        |   (SELECT o_custkey AS k, count(*) AS cnt FROM orders
        |    GROUP BY 1) g
        |   LEFT JOIN (SELECT DISTINCT c_custkey AS pk FROM customer) p
        |     ON g.k = p.pk)
        |SELECT 'lineitem.l_orderkey->orders' AS fk_name,
        |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(CASE WHEN k IS NULL THEN cnt END), 0) AS BIGINT)
        |    AS n_null_rows,
        |  CAST(count(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT)
        |    AS n_distinct_keys,
        |  CAST(count(CASE WHEN k IS NOT NULL AND pk IS NULL THEN 1 END)
        |    AS BIGINT) AS n_orphan_keys,
        |  CAST(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL THEN cnt
        |    END), 0) AS BIGINT) AS n_orphan_rows,
        |  CASE WHEN coalesce(sum(cnt), 0) > 0 THEN
        |    round(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL
        |      THEN cnt END), 0) * 1.0 / sum(cnt), 4) END AS orphan_row_share
        | FROM a1
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |  CAST(coalesce(sum(cnt), 0) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN k IS NULL THEN cnt END), 0) AS BIGINT),
        |  CAST(count(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN k IS NOT NULL AND pk IS NULL THEN 1 END)
        |    AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL THEN cnt
        |    END), 0) AS BIGINT),
        |  CASE WHEN coalesce(sum(cnt), 0) > 0 THEN
        |    round(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL
        |      THEN cnt END), 0) * 1.0 / sum(cnt), 4) END
        | FROM a2
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier',
        |  CAST(coalesce(sum(cnt), 0) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN k IS NULL THEN cnt END), 0) AS BIGINT),
        |  CAST(count(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN k IS NOT NULL AND pk IS NULL THEN 1 END)
        |    AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL THEN cnt
        |    END), 0) AS BIGINT),
        |  CASE WHEN coalesce(sum(cnt), 0) > 0 THEN
        |    round(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL
        |      THEN cnt END), 0) * 1.0 / sum(cnt), 4) END
        | FROM a3
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  CAST(coalesce(sum(cnt), 0) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN k IS NULL THEN cnt END), 0) AS BIGINT),
        |  CAST(count(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN k IS NOT NULL AND pk IS NULL THEN 1 END)
        |    AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL THEN cnt
        |    END), 0) AS BIGINT),
        |  CASE WHEN coalesce(sum(cnt), 0) > 0 THEN
        |    round(coalesce(sum(CASE WHEN k IS NOT NULL AND pk IS NULL
        |      THEN cnt END), 0) * 1.0 / sum(cnt), 4) END
        | FROM a4
        |ORDER BY fk_name""".stripMargin,
    "q28_weekday" ->
      """SELECT CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INTEGER) AS dow,
        | CAST(CASE WHEN isodow(CAST(o_orderdate AS DATE)) - 1 >= 5
        |      THEN 1 ELSE 0 END AS INTEGER) AS is_weekend,
        | count(*) AS n
        | FROM orders GROUP BY dow, is_weekend
        | ORDER BY dow NULLS FIRST""".stripMargin,
    "q29_weekofyear" ->
      """SELECT CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS week,
        | count(*) AS n FROM orders GROUP BY week
        | ORDER BY week NULLS FIRST""".stripMargin,
    "q30_onehot" ->
      """SELECT
        | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS oh_urgent,
        | CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS oh_high,
        | CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS oh_medium,
        | CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS oh_notspec,
        | CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS oh_low
        | FROM orders""".stripMargin,
    "q31_catcodes" ->
      """WITH codes AS (
        |  SELECT o_orderstatus AS s,
        |    CAST(dense_rank() OVER (ORDER BY o_orderstatus) - 1 AS INTEGER) AS code
        |  FROM (SELECT DISTINCT o_orderstatus FROM orders
        |        WHERE o_orderstatus IS NOT NULL))
        |SELECT o_orderstatus, coalesce(code, -1) AS code, count(*) AS n
        | FROM orders LEFT JOIN codes ON o_orderstatus = s
        | GROUP BY o_orderstatus, code
        | ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
    "q32_histogram" ->
      """WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |           FROM orders)
        |SELECT CAST(CASE WHEN mx = mn THEN 0
        |   ELSE least(19, floor((o_totalprice - mn) * 20 / (mx - mn))) END
        |   AS INTEGER) AS bucket, count(*) AS n
        | FROM orders, s WHERE o_totalprice IS NOT NULL
        | GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q33_minmax_norm" ->
      """WITH s AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
        |           FROM lineitem)
        |SELECT l_returnflag,
        |  round(sum(CASE WHEN mx = mn THEN 0.0
        |        ELSE (l_quantity - mn) / (mx - mn) END), 2) AS sum_norm,
        |  count(*) AS n
        | FROM lineitem, s GROUP BY l_returnflag
        | ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q34_running_total" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date,
        |    round(sum(o_totalprice), 2) AS sum_price
        |  FROM orders GROUP BY order_date)
        |SELECT order_date, sum_price,
        |  round(sum(sum_price) OVER (ORDER BY order_date
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_price
        | FROM daily ORDER BY order_date NULLS FIRST""".stripMargin,
    "q44_time_buckets" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        | FROM events GROUP BY bucket_start
        | ORDER BY bucket_start NULLS FIRST""".stripMargin,
    "q45_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        | b AS (SELECT user_id, ts,
        |   CASE WHEN prev_ts IS NULL
        |        OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
        |        THEN 1 ELSE 0 END AS boundary
        |  FROM g),
        | s AS (SELECT user_id,
        |   sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM b),
        | per AS (SELECT user_id, session_seq, count(*) AS n_events
        |  FROM s GROUP BY user_id, session_seq)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  CAST(sum(n_events) AS BIGINT) AS n_events_total
        | FROM per GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,
    "q41_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice), 2) AS sum_price
        | FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        | ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q42_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_suppkey) AS n_supp,
        | count(DISTINCT l_partkey) AS n_part,
        | count(*) AS n
        | FROM lineitem GROUP BY l_returnflag
        | ORDER BY l_returnflag NULLS FIRST""".stripMargin,
    "q35_pivot" ->
      """SELECT o_orderstatus,
        | count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
        | count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
        | count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        | count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        | count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
        | FROM orders GROUP BY o_orderstatus
        | ORDER BY o_orderstatus NULLS FIRST""".stripMargin,
  )
}
