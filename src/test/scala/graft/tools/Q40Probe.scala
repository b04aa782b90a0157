package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.PipelineQueries
import graft.sources.Tables

/** Scratch probe for the q40 top-ngrams gap: decomposes the two-pass
  * design's cost at sf0.1. Run: sbt "Test/runMain graft.tools.Q40Probe"
  */
object Q40Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    println(s"docs: ${Tables.documents(spark, dir).count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      spark.catalog.clearCache()
    }
    for (i <- 1 to 3) {
      time(s"q40 full (construct+count) run$i") {
        PipelineQueries.q40TopNgrams(spark, dir).count()
      }
    }
    // job 1 alone: counting pass + TakeOrdered collect
    for (i <- 1 to 2) {
      time(s"job1 count+min+collect run$i") {
        val docs = graft.operators.Dedup.spread(Tables.documents(spark, dir))
          .select(col("doc_id"), col("text"))
        docs.select(col("doc_id"),
            explode(graft.expressions.HashedShingles.shingles(col("text"), 3)).as("h"))
          .groupBy(col("h"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
          .orderBy(desc("n"), asc("h")).limit(100).collect().length.toLong
      }
    }
    // job 1 without the rep column (pre-round-7 shape)
    for (i <- 1 to 2) {
      time(s"job1 count-only+collect run$i") {
        val docs = graft.operators.Dedup.spread(Tables.documents(spark, dir))
          .select(col("text"))
        docs.select(
            explode(graft.expressions.HashedShingles.shingles(col("text"), 3)).as("h"))
          .groupBy(col("h"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("h")).limit(100).collect().length.toLong
      }
    }
    // job 1 without spread (scan-stage shingling, no text shuffle)
    for (i <- 1 to 2) {
      time(s"job1 no-spread run$i") {
        Tables.documents(spark, dir)
          .select(col("doc_id"),
            explode(graft.expressions.HashedShingles.shingles(col("text"), 3)).as("h"))
          .groupBy(col("h"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
          .orderBy(desc("n"), asc("h")).limit(100).collect().length.toLong
      }
    }
    // direct string aggregation (the degenerate-path plan, DuckDB's shape)
    for (i <- 1 to 2) {
      time(s"direct string count run$i") {
        val docs = graft.operators.Dedup.spread(Tables.documents(spark, dir))
        docs.select(
            explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("gram"))
          .groupBy(col("gram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("gram")).limit(20).collect().length.toLong
      }
    }
    spark.stop()
  }
}
