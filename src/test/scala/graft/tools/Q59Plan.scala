package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Prints the FINAL adaptive plan of the capped exact containment path
  * (scratch). */
object Q59Plan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val df = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.9, maxShingleFreq = Some(500))
    df.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
