package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Containment-family K-sweep (manual; not part of the suite): replicates
  * the sf0.1 documents table K× with shifted ids and a replica tag (so
  * replicas are near-dups, planted qualifying pairs grow ~K² per base
  * doc) and times the exact vs banded containment paths — the
  * mass-duplication regime where candidate-join volume per pair is the
  * dominant term. Run: sbt "Test/runMain graft.tools.ContainStress [K...]"
  */
object ContainStress {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 8, 16)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    for (k <- ks) {
      val big = (0 until k).map { i =>
        base.select(
          (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$i")).as("text"))
      }.reduce(_ unionByName _).cache()
      println(s"--- K=$k: ${big.count()} docs ---")
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
        spark.catalog.clearCache()
        big.cache().count()
      }
      time(s"exact capped K=$k") {
        Dedup.containmentPairs(big, col("doc_id"), col("text"),
          n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
      }
      time(s"banded capped k=8 K=$k") {
        Dedup.containmentPairsLsh(big, col("doc_id"), col("text"),
          n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
      }
      big.unpersist()
    }
    spark.stop()
  }
}
