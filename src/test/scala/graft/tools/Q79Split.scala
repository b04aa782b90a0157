package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Stage split for q79's recall contract (round-14 regression-guard
  * follow-up: the FINAL pair flagged q79 0.965 → 2.348 s while its
  * steady-state probe stayed bit-flat at 0.117 s). q79 times FIVE
  * stages in one job — exact brute top-k, bucketize, two multi-probe
  * lshTopK legs, and the DECLARED-QUADRATIC exact pair baseline
  * (`Dedup.embeddingPairs`, all-pairs cosine at τ=0.45) plus its LSH
  * twin. This tool times each stage alone (warmup + min-of-2,
  * noop-sink — the Bench methodology) so a contract-time swing can be
  * attributed to a stage instead of dispositioned as a blob.
  *
  * Run: sbt "Test/runMain graft.tools.Q79Split"
  */
object Q79Split {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    def timed(f: => Unit): Double = {
      f
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val tExact = timed(noop(Similarity.bruteForceTopK(
      corpus, col("vec_id"), col("embedding"), q, k = 10)))
    val tLshFull = timed(noop(Similarity.lshTopK(
      Similarity.bucketize(corpus, col("vec_id"), col("embedding"), 16),
      q, k = 10, nBits = 16, probeHamming = 16)))
    val tLshPart = timed(noop(Similarity.lshTopK(
      Similarity.bucketize(corpus, col("vec_id"), col("embedding"), 16),
      q, k = 10, nBits = 16, probeHamming = 6)))
    val tPairsExact = timed(noop(Dedup.embeddingPairs(
      emb, col("vec_id"), col("embedding"), threshold = 0.45)))
    val tPairsLsh = timed(noop(Dedup.embeddingPairsLsh(
      emb, col("vec_id"), col("embedding"), threshold = 0.45, nBits = 4)))
    println("| stage | s |")
    println("|---|---|")
    println(f"| exact brute top-k | $tExact%.3f |")
    println(f"| bucketize + lshTopK h=16 | $tLshFull%.3f |")
    println(f"| bucketize + lshTopK h=6 | $tLshPart%.3f |")
    println(f"| exact all-pairs τ=0.45 (declared quadratic) | $tPairsExact%.3f |")
    println(f"| LSH pairs τ=0.45 | $tPairsLsh%.3f |")
    spark.stop()
  }
}
