package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Ranking, Similarity}
import graft.sources.Tables

/** Scale sweeps for the round-12 fourth/fifth-wave operators:
  * q137 perplexity banding, q139 Misra–Gries frequent terms (vs the
  * brute groupBy it screens for), q140 hard-negative mining, q141 data
  * card. Replication devices as in [[R12Sweep]]/[[R12bSweep]]:
  * alphabet rotation for text (vocabulary and bigram-vocabulary grow
  * with K — the dimension that stresses the LM chain and the MG
  * screen; plain replication would only multiply counts), vec_id shift
  * for embeddings (corpus growth at fixed anchor batch).
  *
  * Honesty note for q139: the fixture vocabulary peaks at ~31·K terms —
  * the MG screen's design regime (vocabulary outgrows aggregate
  * memory) is orders of magnitude beyond any local fixture, so this
  * sweep can only verify the screen adds NO super-linear term over the
  * brute path it guards; the crossover itself is a cluster-scale claim
  * argued from the shuffle-volume bound (capacity·partitions counters
  * vs the vocabulary), not measured here.
  *
  * Timed like the bench (warmup, min of 2 cold passes, noop sink).
  * Run: sbt "Test/runMain graft.tools.R12cSweep [K...]" (default 1 4 16)
  */
object R12cSweep {
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
      val base = Tables.documents(spark, sf)
      val path = s"/tmp/graftsweep/r12c_docs_k$k"
      (0 until k).map { r =>
        val rot = r % 26
        base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, alpha.drop(rot) + alpha.take(rot))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }

    def vecsShifted(k: Int): DataFrame = {
      val base = Tables.embeddings(spark, sf)
      val path = s"/tmp/graftsweep/r12c_vecs_k$k"
      (0 until k).map { r =>
        base.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }

    ks.foreach { k =>
      val docs = docsRotated(k)
      val nDocs = docs.count()
      val vecs = vecsShifted(k)
      val nVecs = vecs.count()

      val t137 = timed(noop(Ranking.perplexityBuckets(
        docs, col("doc_id"), col("text"), col("lang"), nBuckets = 3)))
      val t139 = timed(noop(Ranking.frequentTerms(
        docs, col("text"), capacity = 30)))
      val tBrute = timed {
        val toks = docs.select(
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("term"))
        val total = toks.count()
        noop(toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
          .filter(col("n") * lit(31L) > lit(total))
          .orderBy(col("n").desc, col("term").asc))
      }
      val anchors = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("qv"), col("label").as("qlabel"))
      val t140 = timed(noop(Similarity.hardNegatives(
        vecs, col("vec_id"), col("embedding"), col("label"), anchors, 5)))
      val t141 = timed(noop(graft.operators.CorpusStats.dataCard(
        docs, col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))))
      println(f"K=$k%-3d docs=$nDocs%-7d vecs=$nVecs%-7d " +
        f"q137=$t137%.2fs q139=$t139%.2fs brute=$tBrute%.2fs " +
        f"q140=$t140%.2fs q141=$t141%.2fs")
    }
    spark.stop()
  }
}
