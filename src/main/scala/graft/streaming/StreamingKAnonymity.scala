package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming k-anonymity watch: maintain RUNNING quasi-identifier
  * combination counts over everything that has arrived and expose the
  * under-k audit on the live snapshot — the privacy screen a release
  * pipeline keeps open while shards land, so "is this combination
  * still risky?" is answerable without a batch rescan. The streaming
  * form of q146's batch audit
  * ([[graft.operators.CorpusStats.kAnonymity]]).
  *
  * Design: complete-mode streaming aggregation on the qid columns —
  * state is the AGGREGATE (one row per observed combination, the same
  * |combos| bound as the batch audit's exchange), never raw rows
  * (SURVEY.md §7.4.8 discipline; the [[SnapshotRefresh]] family's
  * shape). Complete mode makes the screen SELF-HEALING in the
  * direction that matters: a combination that was risky after one
  * shard silently leaves the audit once later shards push it past k —
  * matching exactly what the batch audit over the union would say.
  * The under-k filter is ONE definition shared by the audit and the
  * batch operator's contract, so stream ≡ batch by construction
  * (pinned in StreamingKAnonymitySpec).
  */
object StreamingKAnonymity {

  /** Start the watch: parquet-file source under `inputDir` → running
    * qid counts in complete mode → in-memory table `queryName`.
    * `Trigger.AvailableNow` drains and stops (the spec's mode); the
    * default processing-time trigger keeps it live. */
  def start(
      spark: SparkSession, inputDir: String, schema: StructType,
      qids: Seq[(String, Column)], queryName: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(qids.nonEmpty, "need at least one quasi-identifier")
    val keys = qids.map { case (name, c) => c.as(name) }
    val keyCols = qids.map { case (name, _) => col(name) }
    spark.readStream.schema(schema).parquet(inputDir)
      .select(keys: _*)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(trigger)
      .start()
  }

  /** The under-k audit over the live snapshot — identical filter to
    * the batch operator (k ≥ 2 guard included for the same reason). */
  def audit(spark: SparkSession, queryName: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (k=1 flags nothing)")
    spark.table(queryName).filter(col("n") < k)
  }
}
