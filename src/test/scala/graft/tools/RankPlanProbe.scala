package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Ranking
import graft.sources.Tables

/** Manual probe backing the round-9 tokenize-once change: for each
  * Ranking operator, counts the corpus scans in the LAZY plan (what
  * executed before the change — each scan is a full re-tokenize) and
  * times lazy vs materialized execution on real data.
  * Run: sbt "Test/runMain graft.tools.RankPlanProbe [sfDir]"
  */
object RankPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val docs = Tables.documents(spark, dir)
    val ops: Seq[(String, Boolean => org.apache.spark.sql.DataFrame)] = Seq(
      "tfIdfTopTerms" -> (m => Ranking.tfIdfTopTerms(docs, col("doc_id"), col("text"), 3, materialize = m)),
      "bm25" -> (m => Ranking.bm25(docs, col("doc_id"), col("text"), Seq("spark", "window", "hash"), 20, materialize = m)),
      "unigramLogProb" -> (m => Ranking.unigramLogProb(docs, col("doc_id"), col("text"), materialize = m)),
      "bigramLogProb" -> (m => Ranking.bigramLogProb(docs, col("doc_id"), col("text"), materialize = m)),
      "oovRate" -> (m => Ranking.oovRate(docs, col("doc_id"), col("text"), 20, materialize = m)),
      "klDivergence" -> (m => Ranking.klDivergence(docs, col("source"), col("text"), materialize = m)))
    for ((name, op) <- ops) {
      val lazyDf = op(false)
      lazyDf.collect() // warm codegen + page cache
      val scans = "Scan parquet".r.findAllIn(
        lazyDf.queryExecution.executedPlan.toString).length
      def time(m: Boolean): Double = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        op(m).count()
        (System.nanoTime() - t0) / 1e9
      }
      val tLazy = time(false)
      val tMat = time(true)
      println(f"== $name%-15s lazyScans=$scans%d lazy=$tLazy%.2fs materialized=$tMat%.2fs")
    }
    spark.stop()
  }
}
