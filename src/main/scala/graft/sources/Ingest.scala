package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Landing layer: page accumulation and the partitioned parquet layout
  * the 100 TB design calls for (SURVEY.md §4.3).
  */
object Ingest {

  /** G68: accumulate ingested pages (the reference's
    * `all_data.extend(batch)`) — schema-tolerant union so late pages with
    * extra/missing keys still land. */
  def accumulatePages(pages: Seq[DataFrame]): DataFrame =
    pages.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Physical layout for scale: land normalized data partitioned by
    * `year` (mirrors the upstream's only server-side filter, A2, so year
    * predicates become partition pruning instead of scans) and sorted
    * within partitions by (street, date, hour) so the seven analyses'
    * group-bys read near-clustered data. `targetFileParallelism` bounds
    * files per partition (small-file control at scale). */
  def land(df: DataFrame, path: String, targetFileParallelism: Int = 8): Unit =
    df.repartition(targetFileParallelism, col("year"))
      .sortWithinPartitions(col("street"), col("date"), col("hour"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("year")
      .parquet(path)

  /** Once-per-JVM year-partitioned landing of the `orders` table (§4.3):
    * rewrites the flat parquet partitioned by `o_year` so year predicates
    * become partition PRUNING (directories never opened) instead of scans
    * — the layout a date-partitioned fact table has at cluster scale.
    * Keyed by source dir so repeated query builds in one session (bench
    * reruns, Verify) land exactly once; the landing is a derived copy, so
    * same-JVM reuse cannot go stale against its own source read.
    *
    * The landing root defaults to the driver's temp dir — correct for
    * local mode (this sandbox) only. On a cluster set `graft.landing.dir`
    * to a SHARED filesystem path (HDFS/S3); a driver-local `file://` path
    * there would scatter partitions across executor disks. Landings are
    * not auto-deleted: they are the point (a reusable layout), and the
    * per-JVM cache reuses rather than re-writes them. */
  private val landings = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def ordersByYearLanding(spark: SparkSession, dir: String): String =
    landings.computeIfAbsent(dir, _ => {
      // The path carries a sanitized source-dir component: the cache is
      // keyed per source dir, so the landing location must be too — a
      // shared fixed path would let one dataset's landing silently serve
      // (or clobber) another's.
      val path = spark.conf.getOption("graft.landing.dir") match {
        case Some(root) =>
          val tag = dir.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_")
          s"${root.stripSuffix("/")}/orders_by_year_$tag"
        case None =>
          java.nio.file.Files.createTempDirectory("graft-orders-by-year-").toString
      }
      Tables.orders(spark, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .repartition(col("o_year"))
        .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(path)
      path
    })

  /** Once-per-JVM source-partitioned landing of the `documents` corpus:
    * every real corpus query slices on `source` (held-out vs web-crawl,
    * per-source mixing rates), so at 100 TB the corpus lives partitioned
    * by it — a `source = 'src0'` probe opens ONE directory instead of
    * scanning the corpus. Same cache/path discipline as
    * [[ordersByYearLanding]] (keyed per source dir; landing root from
    * `graft.landing.dir` on a cluster, driver temp dir in local mode).
    * `source` has bounded cardinality by construction (it names corpora,
    * not documents), so the layout cannot degenerate into per-row
    * directories. */
  def documentsBySourceLanding(spark: SparkSession, dir: String): String =
    landings.computeIfAbsent(s"documents#$dir", _ => {
      val path = spark.conf.getOption("graft.landing.dir") match {
        case Some(root) =>
          val tag = dir.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_")
          s"${root.stripSuffix("/")}/documents_by_source_$tag"
        case None =>
          java.nio.file.Files.createTempDirectory("graft-documents-by-source-").toString
      }
      Tables.documents(spark, dir)
        .repartition(col("source"))
        .write.mode(SaveMode.Overwrite).partitionBy("source").parquet(path)
      path
    })

  /** Bucketed layout for co-located joins (§4.3): both sides of a
    * frequently joined pair written bucketed+sorted on the join key join
    * WITHOUT a shuffle — the bucket layout pre-satisfies the join's
    * required distribution. Requires a catalog table (bucket metadata
    * lives in the metastore, not in parquet). */
  def landBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
