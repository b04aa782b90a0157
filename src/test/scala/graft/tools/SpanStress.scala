package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Scale sweep for substring-level dedup (q77/q80): replicates the
  * sf0.1 documents table K× with shifted ids. Replica text is UNCHANGED
  * — replicated docs are exact duplicates of each other, so every
  * window of a replicated doc is a repeated window (the worst-case
  * output regime: duplicated-span volume grows linearly with K on top
  * of the corpus itself growing linearly). Validates that detection
  * (repeatedSpans) and cut (removeRepeatedSpans) stay near-linear when
  * both the input AND the true-positive output scale.
  * Run: sbt "Test/runMain graft.tools.SpanStress [Ks...]"
  */
object SpanStress {
  def main(args: Array[String]): Unit = {
    val ks: Seq[Int] =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 4, 16)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    // No clearCache here: the replicated corpus is deliberately cached
    // (the sweep measures OPERATOR cost over a resident input, not the
    // Kx union rebuild), and the span operators persist nothing
    // internally that could carry state between passes.
    def timedCount(f: => Long): (Long, Double) = {
      f // warmup
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    println("| K | docs | detect s | spans | cut s | tokens removed |")
    println("|---|---|---|---|---|---|")
    ks.foreach { k =>
      val big = (0 until k).map { i =>
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _).cache()
      val nDocs = big.count()
      val (nSpans, tDetect) = timedCount {
        Dedup.repeatedSpans(big, col("doc_id"), col("text"), k = 8).count()
      }
      val (removed, tCut) = timedCount {
        Dedup.removeRepeatedSpans(big, col("doc_id"), col("text"), k = 8)
          .agg(sum(col("n_before") - col("n_after"))).collect()
          .head.getLong(0)
      }
      println(s"| $k | $nDocs | ${f"$tDetect%.2f"} | $nSpans | ${f"$tCut%.2f"} | $removed |")
      big.unpersist()
    }
    spark.stop()
  }
}
