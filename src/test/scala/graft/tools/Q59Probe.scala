package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch probe for the q59 containment work: times containmentPairs
  * variants at sf0.1. Run: sbt "Test/runMain graft.tools.Q59Probe"
  */
object Q59Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    def docs = Tables.documents(spark, "/root/testdata/sf0.1")
    println(s"docs: ${docs.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      // The operators persist their shingle relation internally; start
      // every timed run from the same cold-cache state or run2/run3 would
      // partly measure cache hits under accumulating memory pressure.
      spark.catalog.clearCache()
    }
    for (i <- 1 to 3) {
      time(s"containmentPairs run$i") {
        Dedup.containmentPairs(docs, col("doc_id"), col("text"),
          n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
      }
    }
    for (i <- 1 to 3) {
      time(s"containmentPairsLsh run$i") {
        Dedup.containmentPairsLsh(docs, col("doc_id"), col("text"),
          n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
      }
    }
    spark.stop()
  }
}
