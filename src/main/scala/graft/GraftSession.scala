package graft

import org.apache.spark.sql.SparkSession

/** Single place for engine session config so Verify, Bench and the test
  * suites run identical settings.
  *
  * Scale-relevant choices:
  *   - AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  *     dynamic broadcast conversion — the knobs that let the same plan run at
  *     sf0.001 and at 100 TB.
  *   - shuffle.partitions defaults to the local core count; on a real cluster
  *     AQE coalesces from a deliberately high initial number.
  *   - UTC session time zone: oracle (DuckDB) parity for all date/hour math.
  *   - nanosAsLong: the testdata's `events.ts` is parquet TIMESTAMP(NANOS),
  *     which Spark refuses by default; we land it as Long and convert in
  *     [[graft.sources.Tables.events]].
  */
object GraftSession {
  def builder(cores: Int, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new GraftExtensions) // SQL functions always available
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  /** Cores from SPARK_GRAFT_CPUS (driver contract), default 32 = local[32]. */
  def envCores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def local(): SparkSession = {
    val n = envCores
    val s = builder(n, n).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
