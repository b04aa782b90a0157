package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Variant timing for the q59 containment pipeline (scratch): cost of the
  * hot cap and of the banded path, warm (bench-style: warmup + 2 timed,
  * no cache clearing). */
object Q59Parts {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-32s ${ts.map(_._1).min}%8.2f s  (${ts.head._2} rows)")
      spark.catalog.clearCache()
    }
    time("exact capped (q59 shape)") {
      Dedup.containmentPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
    }
    time("exact uncapped") {
      Dedup.containmentPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.9).count()
    }
    time("banded capped k=8") {
      Dedup.containmentPairsLsh(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.9, maxShingleFreq = Some(500)).count()
    }
    time("banded uncapped k=8") {
      Dedup.containmentPairsLsh(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.9).count()
    }
    spark.stop()
  }
}
