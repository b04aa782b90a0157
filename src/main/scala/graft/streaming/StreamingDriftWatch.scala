package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming drift watch: maintain RUNNING per-(key, day) event counts
  * over everything that has arrived and expose the truncated-EWMA
  * deviation screen on the live snapshot — the drift monitor a
  * pipeline keeps open while event shards land, answering "did
  * today's volume depart its smoothed level" without a batch rescan.
  * The streaming form of q160's batch screen
  * ([[graft.operators.Funnel.ewmaScreen]]).
  *
  * Design: complete-mode streaming aggregation on (key, day) — state
  * is the AGGREGATE (the |keys|·|days| daily frame, exactly the
  * calendar-bounded input every batch screen in this family runs on),
  * never raw rows (the [[SnapshotRefresh]]/[[StreamingKAnonymity]]
  * discipline). The screen itself is
  * [[graft.operators.Funnel.ewmaScreenDaily]] applied to the
  * snapshot — ONE definition shared with the batch operator, so
  * stream ≡ batch by construction (pinned in StreamingDriftWatchSpec).
  * Complete mode self-heals in both directions: late events for an
  * old day re-enter that day's count, and the whole screen recomputes
  * from the (tiny) daily frame each time it is read.
  */
object StreamingDriftWatch {

  /** Start the watch: parquet-file source under `inputDir` → running
    * (key, day) counts in complete mode → in-memory table `queryName`.
    * `Trigger.AvailableNow` drains and stops (the spec's mode); the
    * default processing-time trigger keeps it live. */
  def start(
      spark: SparkSession, inputDir: String, schema: StructType,
      key: Column, ts: Column, queryName: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(inputDir)
      .select(key.as("key"), ts.cast("date").as("day"))
      .groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(trigger)
      .start()

  /** The EWMA deviation screen over the live snapshot — the batch
    * operator applied to the streamed daily frame, parameter for
    * parameter. */
  def screen(
      spark: SparkSession, queryName: String,
      decay: Double = 0.7, span: Int = 14,
      hSigma: Double = 3.0): DataFrame =
    graft.operators.Funnel.ewmaScreenDaily(
      spark.table(queryName), decay, span, hSigma)
}
