package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Bloom-decontamination crossover probe (round-10 stretch item): stage
  * the regime `crossCorpusOverlapBloom` exists for — a reference
  * (benchmark) corpus whose DISTINCT-shingle set far exceeds the
  * broadcast budget — and measure it against the exact semi-join path at
  * increasing reference sizes.
  *
  * BASELINE.md's sf0.1 pair shows the Bloom screen LOSING (the real
  * testdata's reference side is a few hundred KB of shingles — the
  * exact path's semi join broadcasts it and wins). This sweep
  * synthesizes reference corpora of R docs × ~40 unique tokens
  * (≈ 38·R distinct 3-shingles: 8 bytes × 38·R ≈ 3–90 MB of raw hash
  * keys as R sweeps 10k→300k, i.e. through and past the 10 MB
  * autoBroadcastJoinThreshold), probes them with a fixed 20k-doc shard
  * (10% planted contamination), and times both paths with the bench
  * methodology (warmup + min-of-2, cache cleared between passes).
  *
  * Run: sbt "Test/runMain graft.tools.BloomCrossover [Rs...]"
  */
object BloomCrossover {
  /** Synthetic corpus: doc `id` is 40 tokens `t<base+i>` — token ids are
    * globally unique per (doc, position) within one id range, so
    * distinct-shingle count scales linearly with rows and nothing
    * collapses to a broadcastable set. */
  private def corpus(spark: SparkSession, from: Long, n: Long): DataFrame =
    spark.range(from, from + n).select(col("id"),
      array_join(transform(sequence(lit(0), lit(39)),
        i => concat(lit("t"), (col("id") * 40 + i).cast("string"))), " ")
        .as("text"))

  def main(args: Array[String]): Unit = {
    val rs: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(10000L, 40000L, 120000L, 300000L)
    val probeN = 20000L
    val spark = GraftSession.local()
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    def minOf2(f: => Long): (Long, Double) = {
      f // warmup
      spark.catalog.clearCache()
      val (n1, t1) = timed(f)
      spark.catalog.clearCache()
      val (_, t2) = timed(f)
      (n1, math.min(t1, t2))
    }
    println("| R (ref docs) | distinct shingles | exact s | bloom s | bloom/exact |")
    println("|---|---|---|---|---|")
    rs.foreach { r =>
      // Probe overlaps the last 10% of the reference id range → 10% of
      // probe docs are fully contaminated, the rest are clean.
      val ref = corpus(spark, 0L, r)
      val probe = corpus(spark, r - probeN / 10, probeN)
      val distinctShingles = r * 38 // 40 tokens → 38 unique 3-shingles/doc
      val (nE, tExact) = minOf2 {
        Dedup.crossCorpusOverlap(
          probe, col("id"), col("text"), ref, col("text"), n = 3)
          .filter(col("overlap") > 0.5).count()
      }
      val (nB, tBloom) = minOf2 {
        Dedup.crossCorpusOverlapBloom(
          probe, col("id"), col("text"), ref, col("text"), n = 3,
          fpp = 0.01, expectedItems = Some(distinctShingles))
          .filter(col("overlap") > 0.5).count()
      }
      require(nB >= nE, s"bloom lost hits: $nB < $nE") // one-sided error
      println(f"| $r | ~${distinctShingles / 1000000.0}%.1fM | $tExact%.2f | $tBloom%.2f | ${tBloom / tExact}%.2f |")
    }
    spark.stop()
  }
}
