package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Ranking, ScalableWindow, Split}
import graft.sources.Tables

/** Stage split for q148 (round-18 verdict item: the one r17 regression
  * flag whose 2× raw move wasn't explained by oracle drift — and which
  * reproduces on an idle host, so it is structure, not load): times the
  * difficulty scorer (q72's unigram LM), the scorer + two-phase rank,
  * and the full q148 composition separately, Bench methodology (warmup
  * then min of two cold-cache passes).
  * Run: sbt "Test/runMain graft.tools.Q148Split [sfDir]"
  */
object Q148Split {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val noop = (df: org.apache.spark.sql.DataFrame) =>
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      noop(f) // warmup
      val runs = (1 to 2).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${runs.min}%.2f s (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    val docs = Tables.documents(spark, dir)
    def scored = Ranking.unigramLogProb(
        Dedup.spread(docs), col("doc_id"), col("text"))
      .select(col("__id").as("doc_id"), (-col("logprob")).as("difficulty"))
    def base = docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
    timed("scorer (q72)")(scored)
    timed("scorer+join")(base)
    timed("scorer+join+rank") {
      ScalableWindow.runningTotalBy(
        base.select(col("doc_id").cast("long").as("doc_id"),
          col("difficulty").cast("double").as("difficulty")),
        Seq(col("difficulty").asc_nulls_first, col("doc_id").asc),
        lit(1L), "__rank", 32)
    }
    timed("full q148") {
      Split.curriculumShards(base, col("doc_id"), col("difficulty"),
          nShards = 8, partitions = 32)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("difficulty")).as("min_difficulty"),
          max(col("difficulty")).as("max_difficulty"))
        .orderBy(asc("shard"))
    }
    spark.stop()
  }
}
