package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Scale sweep for q89's PQ path (`Similarity.pqIndex` / `pqTopK`):
  * build-vs-probe split at growing corpus size, against the exact
  * brute-force probe — the Q78Split treatment for the PQ leg.
  *
  * Corpus: sf0.1 embeddings replicated K× (Q87Sweep's norm-preserving
  * cyclic rotation — replicas land ~orthogonal, so the index trains on
  * genuinely diverse vectors). Per K (warmup + min-of-2, noop sink):
  *
  *   - build: pqIndex fit (m=16, ksub=16, iters=2) + encode, the
  *     one-time cost (amortized over every later query);
  *   - ADC probe: pqTopK at rerankN=100 over the PRE-ENCODED persisted
  *     code table — the steady-state per-query cost, scanning one long
  *     per vector;
  *   - brute probe: bruteForceTopK over the float vectors — the exact
  *     baseline the ADC scan undercuts.
  *
  * Run: sbt "Test/runMain graft.tools.Q89Sweep [K...]"  (default 1 8 64)
  */
object Q89Sweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 8, 64)
    val spark = GraftSession.local()
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding"))
    val qv = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") === 0)
      .select(col("embedding")).collect().head.getSeq[Float](0).toArray

    def replicate(k: Int): String = {
      val dir = s"/tmp/graftsweep/emb_pq_k$k"
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
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println("| K | vecs | build s | ADC probe s | brute probe s | recall@100 |")
    println("|---|---|---|---|---|---|")
    for (k <- ks) {
      val dir = replicate(k)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val corpus = emb.filter(col("vec_id") =!= 0)
      val n = corpus.count()
      val buildT = timed {
        val (_, enc) = Similarity.pqIndex(
          corpus, col("vec_id"), col("embedding"), 16, 16, 2)
        noop(enc)
      }
      val (cbs, encoded0) = Similarity.pqIndex(
        corpus, col("vec_id"), col("embedding"), 16, 16, 2)
      val encoded = encoded0.persist()
      encoded.count()
      val adcT = timed(noop(Similarity.pqTopK(cbs, encoded, corpus,
        col("vec_id"), col("embedding"), qv, 10, 100)))
      import spark.implicits._
      val q = Seq(Tuple1(qv)).toDF("qv")
      val bruteT = timed(noop(Similarity.bruteForceTopK(
        corpus, col("vec_id"), col("embedding"), q, 10)))
      val exactIds = Similarity.bruteForceTopK(
          corpus, col("vec_id"), col("embedding"), q, 10)
        .collect().map(_.getLong(0)).toSet
      val adcIds = Similarity.pqTopK(cbs, encoded, corpus,
          col("vec_id"), col("embedding"), qv, 10, 100)
        .collect().map(_.getLong(0)).toSet
      val recall = exactIds.intersect(adcIds).size / 10.0
      encoded.unpersist()
      println(f"| $k | $n | $buildT%.2f | $adcT%.2f | $bruteT%.2f | $recall%.2f |")
    }
    spark.stop()
  }
}
