package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Ranking
import graft.sources.Tables

/** A/B timing for vocabEncode's materialization strategy (round-12
  * q107 constant): lazy (two tokenize passes, no pin) vs materialized
  * (tokenized frame pinned, both passes derive from it). Bench
  * methodology: warmup, then min of two cold-cache passes each.
  * Run: sbt "Test/runMain graft.tools.Q107AB [sfDir]" */
object Q107AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    def run(m: Boolean, spread: Boolean): Unit =
      Ranking.vocabEncode(
          if (spread) graft.operators.Dedup.spread(docs) else docs,
          col("doc_id"), col("text"), vocabSize = 20, materialize = m)
        .orderBy(asc_nulls_first("__id"))
        .write.format("noop").mode("overwrite").save()
    def timed(m: Boolean, s: Boolean): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); run(m, s)
      (System.nanoTime() - t0) / 1e9
    }
    run(true, true); run(false, true)
    run(true, false); run(false, false) // warm all shapes
    for (m <- Seq(true, false); s <- Seq(true, false)) {
      val sec = math.min(timed(m, s), timed(m, s))
      println(f"== vocabEncode materialize=$m%-5s spread=$s%-5s ${sec}%.3f s")
    }
    spark.stop()
  }
}
