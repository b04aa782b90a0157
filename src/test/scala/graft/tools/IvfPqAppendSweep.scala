package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Append-vs-rebuild timing for the COMPOSED IVF+PQ index —
  * [[IndexAppendSweep]]'s shape for the fifth family: a FIXED-SIZE
  * vector shard (replica-0, vec_id % 5 == 3) folded into a corpus that
  * grows with K (sf embeddings id-salted K×), artifacts FROZEN (fit
  * once per K on the pre-shard corpus, shared by both paths — the
  * append contract: growth never retrains):
  *
  *   - append  = [[Similarity.appendToIvfPqIndex]]: one-pass
  *     encode-against-frozen-artifacts of the SHARD + stripe append —
  *     flat in K;
  *   - rebuild = [[Similarity.ivfPqEncode]] of corpus∪shard +
  *     [[Similarity.writeIvfPqIndex]] — re-encodes and rewrites every
  *     row, linear in K (the scale-killer the append path avoids).
  *
  * Probe equality (appended ≡ frozen-artifact rebuild) is spec-gated
  * in `IndexLifecycleSpec`; this tool prints a row-count cross-check
  * plus min-of-2 timings on fresh paths per run.
  * Run: sbt "Test/runMain graft.tools.IvfPqAppendSweep [K ...]"
  */
object IvfPqAppendSweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 16, 64)
    val spark = GraftSession.local()
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    println("| K | corpus vecs | shard vecs | append s | rebuild+write s | rebuild/append | rows (=) |")
    println("|---|---|---|---|---|---|---|")
    ks.foreach { k =>
      // Fixed shard: replica-0's orig%5==3 slice — the same vectors at
      // every K, so the append asymptote is genuinely flat; the corpus
      // is everything else across all K replicas.
      val all = emb.filter(col("vec_id") =!= 0)
        .crossJoin(spark.range(k).select(col("id").as("rep_i")))
        .withColumn("is_shard",
          col("rep_i") === 0 && pmod(col("vec_id"), lit(5)) === 3)
        .select((col("vec_id") * k + col("rep_i")).as("vec_id"),
          col("embedding"), col("is_shard"))
        // Per-component hash noise (the IvfPqBandwidthSweep fix):
        // identical replicas collapse the PQ fit's init codewords into
        // the non-power-of-2 loud failure.
        .select(col("vec_id"),
          zip_with(col("embedding"),
            transform(sequence(lit(0), lit(63)), i =>
              (pmod(xxhash64(col("vec_id") * lit(10007L) + i),
                lit(100000L)) / lit(1e7d)).cast("float")),
            (x, n) => x + n).as("embedding"),
          col("is_shard"))
      val shard = all.filter(col("is_shard")).drop("is_shard")
      val corpus = all.filter(!col("is_shard")).drop("is_shard")
      val (nCorpus, nShard) = (corpus.count(), shard.count())
      val (cents, _) = Similarity.ivfIndex(
        corpus, col("vec_id"), col("embedding"), nLists = 8,
        fitSampleRows = 2000L)
      val cbs = Similarity.ivfPqFitCodebooks(
        corpus, col("vec_id"), col("embedding"), cents, m = 16, ksub = 16,
        iters = 1)
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tmp = System.getProperty("java.io.tmpdir")
      def appendRun(i: Int): Double = {
        val p = s"$tmp/graft_ivfpq_ap_${k}_$i"
        Similarity.writeIvfPqIndex(cents, cbs, Similarity.ivfPqEncode(
          corpus, col("vec_id"), col("embedding"), cents, cbs), p)
        timed(Similarity.appendToIvfPqIndex(
          shard, col("vec_id"), col("embedding"), p))
      }
      def rebuildRun(i: Int): Double = {
        val p = s"$tmp/graft_ivfpq_rb_${k}_$i"
        timed(Similarity.writeIvfPqIndex(cents, cbs, Similarity.ivfPqEncode(
          corpus.unionAll(shard), col("vec_id"), col("embedding"),
          cents, cbs), p))
      }
      val a = math.min(appendRun(1), appendRun(2))
      val r = math.min(rebuildRun(1), rebuildRun(2))
      val nAppended = spark.read
        .parquet(s"$tmp/graft_ivfpq_ap_${k}_2/lists").count()
      val nRebuilt = spark.read
        .parquet(s"$tmp/graft_ivfpq_rb_${k}_2/lists").count()
      val eq = if (nAppended == nRebuilt) "✓" else s"✗ $nAppended/$nRebuilt"
      println(f"| $k | $nCorpus | $nShard | $a%.2f | $r%.2f " +
        f"| ${r / a}%.1f× | $eq |")
    }
    spark.stop()
  }
}
