package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Ranking
import graft.sources.Tables

/** A/B timing for q83's shape (round-12 ranking-constant item):
  * spread vs not × materialized vs lazy, bench methodology (warmup,
  * min of two cold-cache passes). Run:
  * sbt "Test/runMain graft.tools.Q83AB [sfDir]" */
object Q83AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    def run(m: Boolean, spread: Boolean): Unit =
      Ranking.bigramLogProb(
          if (spread) graft.operators.Dedup.spread(docs) else docs,
          col("doc_id"), col("text"), materialize = m)
        .orderBy(asc_nulls_first("__id"))
        .write.format("noop").mode("overwrite").save()
    def timed(m: Boolean, s: Boolean): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); run(m, s)
      (System.nanoTime() - t0) / 1e9
    }
    run(true, true); run(false, true)
    run(true, false); run(false, false)
    for (m <- Seq(true, false); s <- Seq(true, false)) {
      val sec = math.min(timed(m, s), timed(m, s))
      println(f"== bigramLogProb materialize=$m%-5s spread=$s%-5s ${sec}%.3f s")
    }
    spark.stop()
  }
}
