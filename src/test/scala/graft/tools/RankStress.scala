package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Ranking, Similarity, Split}
import graft.sources.Tables

/** Scale-stress for the corpus-curation family (manual; not part of the
  * suite): replicates the sf0.1 documents table K× with shifted ids and
  * a per-replica tag token (so the vocabulary grows slowly while the
  * corpus grows linearly — the realistic shape) and times the ranking /
  * mixing / LM-scoring operators. Validates that each stays near-linear
  * in corpus size: their only corpus-sized shuffle is the (doc, term)
  * count frame, everything else is vocabulary-sized or broadcast.
  * Run: sbt "Test/runMain graft.tools.RankStress [K...]"
  */
object RankStress {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 8)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    for (k <- ks) {
      val big = (0 until k).map { i =>
        base.select(
          (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$i")).as("text"),
          col("lang"), col("source"))
      }.reduce(_ unionByName _).cache()
      println(s"--- K=$k: ${big.count()} docs ---")
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      time("tfidf top-3")(
        Ranking.tfIdfTopTerms(big, col("doc_id"), col("text"), 3).count())
      time("bm25 top-20")(
        Ranking.bm25(big, col("doc_id"), col("text"),
          Seq("spark", "window", "hash"), 20).count())
      time("unigram logprob")(
        Ranking.unigramLogProb(big, col("doc_id"), col("text")).count())
      time("bigram logprob")(
        Ranking.bigramLogProb(big, col("doc_id"), col("text")).count())
      time("oov rate (V=20)")(
        Ranking.oovRate(big, col("doc_id"), col("text"), 20).count())
      time("vocab encode (V=20)")(
        Ranking.vocabEncode(big, col("doc_id"), col("text"), 20).count())
      time("collocations")(
        Ranking.collocations(big, col("doc_id"), col("text"), 5L, 20).count())
      time("inverted index (k=10)")(
        Ranking.invertedIndex(big, col("doc_id"), col("text"), 10).count())
      time("kl by source")(
        Ranking.klDivergence(big, col("source"), col("text")).count())
      time("temperature sample")(
        Split.temperatureSample(big, col("lang"), col("doc_id"), 0.5, 0.5).count())
      time("shuffle order")(
        Split.shuffleOrder(big, col("doc_id"), "pos", 32).count())
      time("stratum cap k=100")(
        Split.capPerStratum(big, col("source"), col("doc_id"), 100).count())
      big.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
