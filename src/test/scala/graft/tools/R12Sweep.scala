package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Funnel, Subword}
import graft.sources.Tables

/** Scale sweeps for the round-12 operator families: q121's subword
  * train+encode, q122's any-touch funnel, and q120's composed curation
  * pipeline. Each input is replicated K× in a way that keeps the
  * operator's work HONEST at K× (no accidental quadratic cross-replica
  * blow-up, or a deliberate and quantified one):
  *
  *  - subword: per-replica alphabet rotation (Q88Sweep's device) — a
  *    char bijection keeps word/substring structure, so vocab
  *    candidates and walk volume scale linearly and the top-V stays a
  *    real contest;
  *  - any-touch: user-id shift — funnels never cross users, so state
  *    and joins scale with users;
  *  - curation: id shift + a per-replica suffix token — quality/lang
  *    are preserved (1 token in ~50), and every original doc becomes a
  *    K-sized NEAR-dup cluster (suffix keeps jaccard > 0.8), so the
  *    dedup stage does K·(K−1)/2 per-doc pair work BY DESIGN: the
  *    sweep's question is whether the pipeline survives its own
  *    dedup-heavy regime, not whether replication is free.
  *
  * Timed like the bench (warmup, min of 2 cold passes, noop sink),
  * inputs written to parquet first. Run:
  * sbt "Test/runMain graft.tools.R12Sweep [K...]" (default 1 4 16)
  */
object R12Sweep {
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
      val path = s"/tmp/graftsweep/r12_docs_rot_k$k"
      (0 until k).map { r =>
        val rot = r % 26
        base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, alpha.drop(rot) + alpha.take(rot))
            .as("text"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }

    def docsSuffixed(k: Int): String = {
      val base = Tables.documents(spark, sf)
      val path = s"/tmp/graftsweep/r12_docs_sfx_k$k"
      (0 until k).map { r =>
        base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" zqxr$r")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/documents.parquet")
      path
    }

    def eventsShifted(k: Int): DataFrame = {
      val base = Tables.events(spark, sf)
        .select(col("user_id"), col("ts"), col("event_type"),
          col("event_id"))
      val path = s"/tmp/graftsweep/r12_events_k$k"
      (0 until k).map { r =>
        base.select((col("user_id") + lit(r * 10000000L)).as("user_id"),
          col("ts"), col("event_type"),
          (col("event_id") + lit(r * 1000000000L)).as("event_id"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }

    println("| K | rows | subword s | anytouch s | curation s |")
    println("|---|---|---|---|---|")
    for (k <- ks) {
      val rot = docsRotated(k)
      val nDocs = rot.count()
      val tSub = timed(noop(Subword.trainEncode(rot, col("doc_id"),
        col("text"), vocabSize = 50, maxPieceLen = 4)))
      val ev = eventsShifted(k)
      val tAny = timed(noop(Funnel.anyTouchFunnel(ev, col("user_id"),
        col("ts"), col("event_type"), col("event_id"),
        Seq("view", "click", "purchase"),
        gapMicros = 24L * 3600L * 1000000L, maxEventsPerUserType = 256)))
      val cd = docsSuffixed(k)
      val tCur = timed(noop(
        graft.queries.PipelineQueries.q120CurationPipeline(spark, cd)))
      println(f"| $k | $nDocs | $tSub%.2f | $tAny%.2f | $tCur%.2f |")
    }
    spark.stop()
  }
}
