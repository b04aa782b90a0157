package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Focused K=32 re-time of the two MinHash LSH stages (manual;
  * BASELINE.md) — isolates them from ScaleStress's stage sequence.
  * Run: sbt "Test/runMain graft.tools.LshProbe [K]"
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val big = (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionByName _).cache()
    println(s"corpus: ${big.count()} docs (${k}x)")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      spark.catalog.clearCache()
      big.cache().count()
    }
    time("minhash LSH pairs") {
      Dedup.minhashLshPairs(big, col("doc_id"), col("text")).count()
    }
    time("minhash LSH + exact verify") {
      Dedup.minhashLshVerifiedPairs(big, col("doc_id"), col("text")).count()
    }
    spark.stop()
  }
}
