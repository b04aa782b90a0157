package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Cluster
import graft.sources.Tables

/** Scale sweep for q87's SemDeDup (`Cluster.semanticDedup`).
  *
  * The operator's scale contract is that k-means buckets bound the
  * quadratic pair search: pair volume is Σ|cluster|², so with k FIXED
  * the clusters grow with the corpus and the pair stage degrades
  * quadratically, while k SCALED with the corpus (bounded expected
  * cluster size) keeps it near-linear. This tool measures both regimes
  * so the claim is a number, not a sentence.
  *
  * Corpus: the sf0.1 embeddings replicated K× with ids shifted and each
  * replica's vectors CYCLICALLY SHIFTED by r positions (norm-preserving;
  * random-vector replicas land ~orthogonal to other shifts, while
  * within-replica pairwise cosines are EXACTLY preserved — the planted
  * near-dup population grows linearly with K instead of exploding).
  * Written to /tmp/graftsweep/emb_k<K>/embeddings.parquet so every
  * timed run reads from disk like the bench.
  *
  * Per K (Bench methodology — warmup + min-of-2):
  *   - kmeans-only at scaled k (assignment scans + recompute aggs),
  *   - semanticDedup with k fixed at 8 (the q87 geometry),
  *   - semanticDedup with k = 8·K (bounded-cluster regime),
  * plus the dropped-row count of each dedup as the work sanity check.
  *
  * Run: sbt "Test/runMain graft.tools.Q87Sweep [K...]"   (default 1 4 16)
  */
object Q87Sweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding"))

    def replicate(k: Int): String = {
      val dir = s"/tmp/graftsweep/emb_k$k"
      val d = 64
      (0 until k).map { r =>
        val s = r % d
        val shifted =
          if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, d - s),
            slice(col("embedding"), 1, s))
        base.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          shifted.as("embedding"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
      dir
    }

    def timed(f: => Unit): Double = {
      f // warmup
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println("| K | vecs | kmeans-only(8K) s | dedup k=8 s | dedup k=8K s | dedup 2lvl 8xK s | dropped k=8 | dropped k=8K | dropped 2lvl |")
    println("|---|---|---|---|---|---|---|---|---|")
    for (k <- ks) {
      val dir = replicate(k)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      // The flat assignment literal is the deterministic contract for
      // MODERATE k; past ~256 centroids its n·k·d per-scan cost (and
      // plan size) is the wrong tool — the scale path is coarse-
      // quantized assignment (see SCALE.md). Guard the sweep likewise.
      val runScaled = 8 * k <= 256
      val kmeansT = if (runScaled) timed(noop(
        Cluster.lloydKMeans(emb, col("vec_id"), col("embedding"), 8 * k, 2)))
        else Double.NaN
      // Fixed-k candidate volume is n²/8 — at K=64 that is 2.05 B pairs
      // and 341 s (measured once, BASELINE.md); skip re-paying it on
      // later sweeps of the other regimes.
      val runFixed = k <= 16
      val fixedT = if (runFixed) timed(noop(
        Cluster.semanticDedup(emb, col("vec_id"), col("embedding"), 8, 2, 0.45)))
        else Double.NaN
      val scaledT = if (runScaled) timed(noop(
        Cluster.semanticDedup(emb, col("vec_id"), col("embedding"), 8 * k, 2, 0.45)))
        else Double.NaN
      val dropFixed = if (runFixed) Cluster.semanticDedup(
        emb, col("vec_id"), col("embedding"), 8, 2, 0.45)
        .filter(!col("keep")).count() else -1L
      val dropScaled = if (runScaled) Cluster.semanticDedup(
        emb, col("vec_id"), col("embedding"), 8 * k, 2, 0.45)
        .filter(!col("keep")).count() else -1L
      // Two-level at the SAME effective cluster count as the scaled
      // flat run (8 cells × k fine = 8k), but n·(8+k)·d assignment
      // instead of n·8k·d — the measured payoff of the coarse pass.
      val twoT = timed(noop(Cluster.semanticDedupTwoLevel(
        emb, col("vec_id"), col("embedding"), 8, k, 2, 0.45)))
      val dropTwo = Cluster.semanticDedupTwoLevel(
        emb, col("vec_id"), col("embedding"), 8, k, 2, 0.45)
        .filter(!col("keep")).count()
      println(f"| $k | $n | $kmeansT%.2f | $fixedT%.2f | $scaledT%.2f | $twoT%.2f | $dropFixed | $dropScaled | $dropTwo |")
    }
    spark.stop()
  }
}
