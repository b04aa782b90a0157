package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
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
