package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.CorpusQueries
import graft.sources.Tables

/** Spark-side half of the round-14 two-sided scale sweep for the four
  * worst remaining bench ratios (q137 3.7×, q182 3.7×, q107 3.2×,
  * q135 2.5×) — the queries the round-13 verdict dispositioned from
  * Spark-only flatness. This pairs them with DuckDB on the SAME
  * replicated parquet (`tools/r14_sweep.py`, the q81/q43 pattern that
  * earned those entries CLOSED status), so crossover is measured, not
  * argued.
  *
  * Replication keeps text identical (ids shifted): the distinct
  * vocabulary / bigram domain / BPE pair table stays constant while
  * document volume grows K× — the "more docs, same language" regime
  * all four operators are designed to amortize in (their per-iteration
  * or per-distinct-unit work is Heaps-bounded; only the scoring /
  * encode pass scales with rows).
  *
  * Reuses /tmp/graftsweep/k<K>/documents.parquet when already written
  * (marker file). Timing: Bench methodology — warmup + min-of-2
  * cold-cache noop-sink passes.
  *
  * Run: sbt "Test/runMain graft.tools.R14Sweep [K...]"; then
  *      python3 tools/r14_sweep.py <dir-with-oracle_sql.json> [K...]
  */
object R14Sweep {
  private val Queries = Seq(
    "q137_ppl_buckets" -> (CorpusQueries.q137PplBuckets _),
    "q182_train_quality_lr" -> (CorpusQueries.q182TrainQualityLr _),
    "q107_vocab_encode" -> (CorpusQueries.q107VocabEncode _),
    "q135_bpe_fertility" -> (CorpusQueries.q135BpeFertility _))

  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16, 64)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    def timed(f: => Unit): Double = {
      f // warmup
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println("| K | docs | " + Queries.map(_._1 + " s").mkString(" | ") + " |")
    println("|---|---|" + Queries.map(_ => "---").mkString("|") + "|")
    for (k <- ks) {
      val dir = s"/tmp/graftsweep/k$k"
      val marker = Paths.get(s"$dir/_R14_READY")
      if (!Files.exists(marker)) {
        (0 until k).map { i =>
          base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        }.reduce(_ unionByName _)
          .repartition(math.max(8, k / 2))
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
        Files.createFile(marker)
      }
      val times = Queries.map { case (_, fn) => timed(noop(fn(spark, dir))) }
      println(f"| $k | ${5000L * k} | " +
        times.map(t => f"$t%.2f").mkString(" | ") + " |")
    }
    spark.stop()
  }
}
