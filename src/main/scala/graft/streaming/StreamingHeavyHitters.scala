package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.expressions.MisraGriesTopK.Kernel
import graft.functions.TextFunctions.tokens

/** Streaming heavy-hitter screen: the continuous form of
  * [[graft.operators.Ranking.frequentTerms]]'s Misra–Gries candidate
  * nomination, for "which terms are trending across the corpus feed"
  * without ever materializing the vocabulary.
  *
  * Sharding: terms hash into `nBuckets` buckets and each bucket keeps
  * its OWN Misra–Gries summary (capacity counters + the bucket's token
  * count) in keyed state — `flatMapGroupsWithState` over the bucket id.
  * A term lives in exactly one bucket, so its bucket-local frequency IS
  * its global frequency, and the per-bucket guarantee (survives if
  * freq > N_bucket/(capacity+1)) is NEVER WEAKER than the global one
  * (N_bucket ≤ N): the union of bucket summaries is a valid global
  * screen — candidates ⊇ every term with freq > N/(capacity+1). The
  * sharding is what makes the operator scale: state is
  * nBuckets·capacity counters total, each micro-batch's shuffle is the
  * token stream hashed by bucket, and no single task owns the stream.
  *
  * Emission: after each micro-batch, every updated bucket re-emits its
  * full summary stamped with the bucket's running token count
  * (`bucket_n`). A consumer keeps the rows from each bucket's LARGEST
  * bucket_n (the latest snapshot — bucket_n is monotone) and applies
  * the same exact-rerank the batch operator applies. Like the other
  * one-sided streaming screens ([[StreamingDecontam]]'s Bloom), the
  * contract is candidates-never-miss; counts are lower bounds, not
  * results. Stream-vs-batch: the final screen over any prefix equals
  * running the Kernel over that prefix in arrival order — same
  * arithmetic, one definition — and the superset guarantee holds
  * regardless of how the prefix was micro-batched
  * (StreamingHeavyHittersSpec pins both).
  *
  * Determinism caveat: WHICH light terms ride along in a summary
  * depends on micro-batch boundaries (the batch screen has the same
  * arrival-order dependence across partitions); only the guarantee is
  * deterministic, which is why consumers must rerank exactly — the
  * composition, not the summary, is the result surface. */
object StreamingHeavyHitters {

  case class MgState(counts: Map[String, Long], n: Long)
  case class BucketSummary(bucket: Int, term: String, lb_count: Long,
      bucket_n: Long)

  /** The per-bucket state transition, shared with the spec's reference
    * replay: fold the batch's terms into the summary via the SAME
    * kernel the aggregate expression runs. */
  def foldTerms(
      state: MgState, terms: Iterator[String], capacity: Int): MgState = {
    val m = mutable.HashMap.empty[String, Long]
    state.counts.foreach { case (k, v) => m.update(k, v) }
    var n = state.n
    terms.foreach { t => Kernel.update(m, t, capacity); n += 1L }
    MgState(m.toMap, n)
  }

  /** Start the screen: parquet-file source under `inputDir` →
    * tokenize → bucket-hash shuffle → keyed MG state → summary
    * snapshots appended to `outDir` (Update-mode semantics through
    * foreachBatch: a bucket re-emits only when it saw tokens). */
  def start(
      spark: SparkSession, inputDir: String, schema: StructType,
      textCol: Column, capacity: Int, nBuckets: Int,
      outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val summaries: Dataset[BucketSummary] = spark.readStream
      .schema(schema).parquet(inputDir)
      .select(explode(tokens(textCol)).as("term"))
      .select(col("term"),
        pmod(hash(col("term")), lit(nBuckets)).as("bucket"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[MgState, BucketSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[(String, Int)],
         state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val next = foldTerms(prev, rows.map(_._1), capacity)
          state.update(next)
          next.counts.iterator.map { case (t, c) =>
            BucketSummary(bucket, t, c, next.n)
          }
      }
    summaries.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[BucketSummary], _: Long) =>
        batch.write.mode("append").parquet(outDir): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Consumer-side resolution of the appended snapshots: the latest
    * summary per bucket (largest bucket_n), unioned — the candidate
    * set to exact-rerank. */
  def latestCandidates(spark: SparkSession, outDir: String): Dataset[String] = {
    import spark.implicits._
    val snaps = spark.read.parquet(outDir)
    val latest = snaps.groupBy(col("bucket"))
      .agg(max(col("bucket_n")).as("bucket_n"))
    snaps.join(latest, Seq("bucket", "bucket_n"))
      .select(col("term")).distinct().as[String]
  }
}
