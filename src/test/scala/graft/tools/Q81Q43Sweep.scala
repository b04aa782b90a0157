package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions
import graft.queries.PipelineQueries
import graft.sources.Tables

/** Spark-side half of the q81/q43 scale sweep (round-11 verdict: the
  * only two above-2×-above-floor bench entries without measured
  * dispositions). Writes K-replicated copies of the sf0.1 documents
  * table (ids shifted, text + source unchanged) to
  * /tmp/graftsweep/k<K>/documents.parquet and times, per K with the
  * Bench methodology (warmup + min-of-2, noop-sink action):
  *
  *   - q81 full (`tokenBudgetSelect`: score → two-phase cumsum →
  *     budget scalar → filter),
  *   - q81's scoring projection alone (one codegen'd pass, no
  *     shuffle) — the difference is the cumsum + budget machinery,
  *     whose JOB COUNT is fixed (range exchange, checkpoint, totals
  *     collect, broadcast join) while its per-row work is one long add,
  *   - q43 full (partition-pruned two-sided landing read → shingle
  *     explode → distinct-corpus-gram semi join → per-doc counts).
  *
  * The DuckDB half (`tools/q81q43_sweep.py`) runs the committed oracle
  * SQL for both queries against the same parquet files. Replication
  * keeps text identical, so the corpus's DISTINCT shingle set is
  * constant while per-row volume grows K× — for q43 that is the regime
  * its fixed explode floor should amortize in; dedup across replicas
  * happens in both engines identically.
  * Run: sbt "Test/runMain graft.tools.Q81Q43Sweep [K...]"
  */
object Q81Q43Sweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    def timed(f: => Unit): Double = {
      f // warmup (codegen; also builds q43's by-source landing once)
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println("| K | docs | q81 full s | q81 score-only s | q43 s |")
    println("|---|---|---|---|---|")
    for (k <- ks) {
      val dir = s"/tmp/graftsweep/k$k"
      val big = (0 until k).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      }.reduce(_ unionByName _)
      big.repartition(8).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/documents.parquet")
      val nDocs = 5000L * k
      val tQ81 = timed(noop(PipelineQueries.q81TokenBudget(spark, dir)))
      val tScore = timed(noop(
        Tables.documents(spark, dir).select(
          col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))))
      val tQ43 = timed(noop(PipelineQueries.q43Contamination(spark, dir)))
      println(f"| $k | $nDocs | $tQ81%.2f | $tScore%.2f | $tQ43%.2f |")
    }
    spark.stop()
  }
}
