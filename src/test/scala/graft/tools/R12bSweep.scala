package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Ranking, Similarity, Subword}
import graft.sources.Tables

/** Scale sweeps for the second wave of round-12 operators: q126's BPE
  * merge training, q127's random projection, q130's hashed linear
  * classifier. Same replication devices as [[R12Sweep]]:
  *
  *  - BPE + classifier: per-replica alphabet rotation — a char
  *    bijection, so the distinct-WORD table (where all of BPE's
  *    per-iteration work lives) grows linearly with K and every
  *    replica's pair counts stay a real contest (plain replication
  *    would only multiply counts, leaving per-iteration work flat —
  *    a dishonest sweep);
  *  - projection: vec_id shift — the operator is a pure map, the sweep
  *    verifies the absence of any super-linear term.
  *
  * Timed like the bench (warmup, min of 2 cold passes, noop sink).
  * Run: sbt "Test/runMain graft.tools.R12bSweep [K...]" (default 1 4 16)
  */
object R12bSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val alpha = "abcdefghijklmnopqrstuvwxyz"

    def timed(f: => Unit): Double = {
      f
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def docsRotated(k: Int): DataFrame = {
      val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val path = s"/tmp/graftsweep/r12b_docs_k$k"
      (0 until k).map { r =>
        val rot = r % 26
        base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, alpha.drop(rot) + alpha.take(rot))
            .as("text"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }

    def vecsShifted(k: Int): DataFrame = {
      val base = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val path = s"/tmp/graftsweep/r12b_vecs_k$k"
      (0 until k).map { r =>
        base.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }

    println("| K | docs | bpe(6) s | classifier s | vecs | project s |")
    println("|---|---|---|---|---|---|")
    for (k <- ks) {
      val rot = docsRotated(k)
      val nDocs = rot.count()
      val tBpe = timed(noop(
        Subword.bpeMerges(rot, col("text"), nMerges = 6)))
      val tCls = timed(noop(Ranking.hashedLinearScore(rot,
        col("doc_id"), col("text"), nBuckets = 256, seed = "q130",
        bias = 0.0, threshold = 0.5)))
      val v = vecsShifted(k)
      val nVecs = v.count()
      val tProj = timed(noop(Similarity.randomProjection(v,
        col("vec_id"), col("embedding"), inDim = 64, outDim = 16)))
      println(f"| $k | $nDocs | $tBpe%.2f | $tCls%.2f | $nVecs | $tProj%.2f |")
    }
    spark.stop()
  }
}
