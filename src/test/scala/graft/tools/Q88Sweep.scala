package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Scale sweep for q88's PassJoin edit-distance join
  * (`Dedup.editDistancePairs`).
  *
  * The operator's scale contract: index side O(n·(d+1)), probe side a
  * CONSTANT (d+1)²(2d+1) fan-out per doc, candidates from an equi-join
  * on hashed longs — so time should grow ~linearly in the corpus while
  * the pair population does. This tool measures that.
  *
  * Corpus: sf0.1 documents replicated K× with ids shifted and each
  * replica's text passed through a per-replica ALPHABET ROTATION
  * (`translate` by a cyclic shift of a-z). A character bijection
  * preserves levenshtein exactly, so every within-replica pair
  * survives at its original distance (planted population = K×251),
  * while cross-replica texts share no segments and sit at distance
  * ≥ their per-char disagreement — no K² candidate or pair blow-up
  * (a naive copy-replication would make every doc a cross-replica
  * twin and quadratically flood the candidate join; the rotation is
  * what makes the sweep honest). Written to parquet so every timed
  * run reads from disk like the bench; warmup + min-of-2, noop sink.
  *
  * Run: sbt "Test/runMain graft.tools.Q88Sweep [K...]"  (default 1 4 16)
  */
object Q88Sweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val alpha = "abcdefghijklmnopqrstuvwxyz"

    def replicate(k: Int): String = {
      val dir = s"/tmp/graftsweep/docs_ed_k$k"
      (0 until k).map { r =>
        val rot = r % 26
        val mapped = alpha.drop(rot) + alpha.take(rot)
        base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, mapped).as("text"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
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

    println("| K | docs | editDistancePairs s | pairs |")
    println("|---|---|---|---|")
    for (k <- ks) {
      val dir = replicate(k)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val t = timed(noop(
        Dedup.editDistancePairs(docs, col("doc_id"), col("text"), 4)))
      val pairs = Dedup.editDistancePairs(docs, col("doc_id"), col("text"), 4)
        .count()
      println(f"| $k | $n | $t%.2f | $pairs |")
    }
    spark.stop()
  }
}
