package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.CorpusStats

/** Streaming tokenizer-coverage / OOV drift screen: maintain RUNNING
  * per-language token and covered-token counts of everything that has
  * arrived against a FIXED reference vocabulary, and expose q188's
  * coverage report on the live snapshot — the governance signal a
  * production subword-encode pipeline (q187's vocabulary-JOIN path)
  * actually watches: a language whose OOV rate drifts up is a corpus
  * the frozen tokenizer no longer fits.
  *
  * Design (the [[StreamingDriftWatch]] shape): the vocabulary is a
  * broadcast static frame (it is FROZEN — that is the premise of
  * watching drift against it), the per-batch work is the stream-static
  * left join + complete-mode aggregation of
  * [[CorpusStats.vocabCoverageCounts]] — state is the ≤|langs|-row
  * counts frame, never raw tokens — and the screen is
  * [[CorpusStats.oovRates]] over the snapshot. All three pieces are
  * the ONE shared definition q188's DuckDB-gated batch audit runs, so
  * stream ≡ batch by construction (pinned in
  * `StreamingVocabCoverageSpec`). Complete mode self-heals: every
  * read recomputes the report from the tiny counts frame.
  */
object StreamingVocabCoverage {

  /** Start the screen: parquet-file source under `inputDir` → running
    * per-language (n_tokens, n_covered) vs `vocab` (one column `w`) in
    * complete mode → in-memory table `queryName`.
    * `Trigger.AvailableNow` drains and stops (the spec's mode); the
    * default processing-time trigger keeps it live. */
  def start(
      spark: SparkSession, inputDir: String, schema: StructType,
      lang: Column, text: Column, vocab: DataFrame, queryName: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    CorpusStats.vocabCoverageCounts(
        CorpusStats.langTokens(
          spark.readStream.schema(schema).parquet(inputDir), lang, text),
        vocab)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(trigger)
      .start()

  /** The coverage/OOV report over the live snapshot — q188's
    * projection applied to the streamed counts, parameter for
    * parameter. */
  def screen(spark: SparkSession, queryName: String): DataFrame =
    CorpusStats.oovRates(spark.table(queryName))
}
