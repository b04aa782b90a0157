package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Append-vs-rebuild timing for the durable corpus index (round-16
  * item 1's done-criterion): the nightly-growth shape is a FIXED-SIZE
  * shard (replica-0 src8∪src12 — the same docs at every K) folded into
  * a corpus that GROWS with the fixture K, so the two paths' asymptotes
  * separate instead of both scaling with K:
  *
  *   - append  = [[Dedup.appendToCorpusIndex]]: shard shingle + band +
  *     bucket-spec insertInto — pays the SHARD's cost, flat in K;
  *   - rebuild = [[Dedup.corpusIndex]] on corpus∪shard +
  *     [[Dedup.writeCorpusIndex]] — pays the CORPUS's cost, linear in K
  *     (the 100 TB scale-killer the append path exists to avoid).
  *
  * Probe equality (appended ≡ rebuilt, bit-equal) is gated in
  * `IndexLifecycleSpec` and oracle-gated as q190; this tool prints a
  * cheap count cross-check per row plus min-of-2 timings (fresh table
  * prefixes per iteration — a write path can't re-run in place).
  * Requires the ScaleFixture parquet for K>1 (run ScaleFixture first);
  * K=1 reads pristine sf0.1.
  *
  * Run: sbt "Test/runMain graft.tools.IndexAppendSweep [K ...]"
  */
object IndexAppendSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 16, 64)
    val spark = GraftSession.local()
    val shardSrc = Seq("src8", "src12")
    val replicaShift = 10000000L // ScaleFixture's per-replica doc_id shift

    println("| K | corpus docs | shard docs | append s | rebuild+write s | rebuild/append | probe pairs (=) |")
    println("|---|---|---|---|---|---|---|")
    ks.foreach { k =>
      val dir =
        if (k == 1) "/root/testdata/sf0.1" else s"/tmp/graft_scale/v1_k$k"
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("source"))
      val inShard =
        col("source").isInCollection(shardSrc) && col("doc_id") < replicaShift
      val shard = docs.filter(inShard)
      val corpus = docs.filter(!inShard && col("source") =!= "src0")
      val probe = docs.filter(col("source") === "src0" &&
        col("doc_id") < replicaShift)
      val (nCorpus, nShard) = (corpus.count(), shard.count())

      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def buildWrite(prefix: String, d: DataFrame): Unit = {
        val idx = Dedup.corpusIndex(d, col("doc_id"), col("text"))
        Dedup.writeCorpusIndex(idx, prefix)
        idx.unpersist()
      }
      def probeCount(prefix: String): Long = {
        val loaded = Dedup.loadCorpusIndex(spark, prefix)
        Dedup.nearDupAgainstIndex(
          probe, col("doc_id"), col("text"), loaded, threshold = 0.8).count()
      }
      // One iteration = fresh prefixes, initial partial-corpus
      // build (untimed setup), then the two timed paths over identical
      // inputs. clearCache between — both builders persist internally.
      def once(i: Int): (Double, Double, Long, Long) = {
        val (pA, pB) = (s"graft_appsw_k${k}_a$i", s"graft_appsw_k${k}_b$i")
        buildWrite(pA, corpus)
        spark.catalog.clearCache()
        val tA = timed(Dedup.appendToCorpusIndex(
          shard, col("doc_id"), col("text"), pA))
        spark.catalog.clearCache()
        val tB = timed(buildWrite(pB, corpus.unionByName(shard)))
        spark.catalog.clearCache()
        (tA, tB, probeCount(pA), probeCount(pB))
      }
      val (a1, r1, cA, cB) = once(1)
      val (a2, r2, _, _) = once(2)
      val eq = if (cA == cB) s"$cA ✓" else s"$cA≠$cB ✗"
      println(f"| $k | $nCorpus | $nShard | ${math.min(a1, a2)}%.2f " +
        f"| ${math.min(r1, r2)}%.2f | ${math.min(r1, r2) / math.min(a1, a2)}%.1f× | $eq |")
    }
    spark.stop()
  }
}
