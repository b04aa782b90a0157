package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{CorpusStats, Dedup, Ranking, Split}
import graft.sources.Tables

/** Scale sweeps for the round-12 wave-8/9 operators: q145 deletion
  * cascade (pair-generation-dominated — the cascade adds one
  * cluster-keyed aggregate on top of q64's swept pair path), q147 DSIR
  * importance weights (q72's token-volume shape plus a second
  * vocabulary aggregate), q148 curriculum shards (q72 chain + the
  * two-phase global rank), q151 PII density and q152 sequence budget
  * (single-aggregate scans — included to pin linearity). Alphabet
  * rotation grows the vocabulary with K (the R12Sweep device); the
  * deletion list and the lang target scale with the corpus by
  * construction (id residues / stored lang).
  *
  * Timed like the bench (warmup, min of 2 cold passes, noop sink).
  * Run: sbt "Test/runMain graft.tools.R12dSweep [K...]" (default 1 4 16)
  */
object R12dSweep {
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
      val path = s"/tmp/graftsweep/r12d_docs_k$k"
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

    ks.foreach { k =>
      val docs = docsRotated(k)
      val nDocs = docs.count()

      val t145 = timed(noop(Dedup.deletionCascade(
        docs, col("doc_id"), col("text"), col("doc_id") % 17 === 3)))
      val t147 = timed(noop(Ranking.dsirWeights(
        docs, col("doc_id"), col("text"), col("lang") === "en", topN = 50)))
      val t148 = timed {
        val scored = Ranking.unigramLogProb(
            Dedup.spread(docs), col("doc_id"), col("text"))
          .select(col("__id").as("doc_id"),
            (-col("logprob")).as("difficulty"))
        val base = docs.select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
        noop(Split.curriculumShards(base, col("doc_id"), col("difficulty"),
            nShards = 8, partitions = 32)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("difficulty")).as("mn"), max(col("difficulty")).as("mx")))
      }
      val t151 = timed(noop(CorpusStats.piiDensity(
        docs, col("source"), col("text"))))
      val t152 = timed(noop(CorpusStats.sequenceBudget(
        docs, col("lang"), col("text"), seqLen = 128)))
      println(f"K=$k%-3d docs=$nDocs%-7d " +
        f"q145=$t145%.2fs q147=$t147%.2fs q148=$t148%.2fs " +
        f"q151=$t151%.2fs q152=$t152%.2fs")
    }
    spark.stop()
  }
}
