package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Round-20 stage splitter: where do the seconds go INSIDE the composed
  * lifecycle queries (q191/q193/q195–q199) and the recall-gate queries?
  * Reproduces each query's operator sequence with per-stage timers and a
  * noop sink per lazy frame, so a stage's number is its own computation,
  * not its consumers'. Methodology: one warm pass then min-of-2, same as
  * Bench. Diagnostic only — results are printed, never returned.
  */
object R20Split {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    var acc = Vector.empty[(String, Double)]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      acc :+= (name -> s)
      println(f"[r20split]   $name%-38s $s%7.3f s")
      r
    }

    def section(name: String)(body: => Unit): Unit = {
      println(s"[r20split] === $name ===")
      acc = Vector.empty
      body // warm
      val warm = acc
      acc = Vector.empty
      spark.catalog.clearCache()
      println(s"[r20split] --- $name timed pass ---")
      body
      println(f"[r20split] $name total ${acc.map(_._2).sum}%.3f s " +
        f"(warm ${warm.map(_._2).sum}%.3f s)")
    }

    val which = if (args.isEmpty) Set("q197", "q196", "q193", "q186", "q191")
                else args.toSet

    if (which("q197")) section("q197_ivfpq_batch_probe") {
      val emb = Tables.embeddings(spark, sfDir)
      val (centroids, _) = timed("ivfIndex fit") {
        Similarity.ivfIndex(emb, col("vec_id"), col("embedding"), nLists = 8)
      }
      val cbs = timed("ivfPqFitCodebooks") {
        Similarity.ivfPqFitCodebooks(emb, col("vec_id"), col("embedding"),
          centroids, m = 16, ksub = 16, iters = 1)
      }
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_r20_q197"
      timed("encode+writeIvfPqIndex") {
        Similarity.writeIvfPqIndex(centroids, cbs,
          Similarity.ivfPqEncode(emb, col("vec_id"), col("embedding"),
            centroids, cbs), path)
      }
      val fresh = spark.newSession()
      val emb2 = Tables.embeddings(fresh, sfDir)
      val (cents, cbs2, codes) = timed("loadIvfPqIndex") {
        Similarity.loadIvfPqIndex(fresh, path)
      }
      val n = timed("emb2.count") { emb2.count() }
      timed("ivfPqTopKBatch+orderBy noop") {
        noop(Similarity.ivfPqTopKBatch(cents, cbs2, codes,
            emb2, col("vec_id"), col("embedding"),
            emb2.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
            k = 5, nProbe = 8,
            rerankN = math.min(n, Int.MaxValue.toLong).toInt)
          .orderBy(asc("query_id"), asc("rank")))
      }
    }

    if (which("q196")) section("q196_ivfpq_reload_probe") {
      val emb = Tables.embeddings(spark, sfDir)
      val old = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) =!= 3)
      val shard = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) === 3)
      val (centroids, _) = timed("ivfIndex fit") {
        Similarity.ivfIndex(old, col("vec_id"), col("embedding"), nLists = 8)
      }
      val cbs = timed("ivfPqFitCodebooks") {
        Similarity.ivfPqFitCodebooks(old, col("vec_id"), col("embedding"),
          centroids, m = 16, ksub = 16, iters = 1)
      }
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_r20_q196"
      timed("encode+writeIvfPqIndex") {
        Similarity.writeIvfPqIndex(centroids, cbs,
          Similarity.ivfPqEncode(old, col("vec_id"), col("embedding"),
            centroids, cbs), path)
      }
      timed("appendToIvfPqIndex") {
        Similarity.appendToIvfPqIndex(shard, col("vec_id"), col("embedding"),
          path)
      }
      val fresh = spark.newSession()
      val emb2 = Tables.embeddings(fresh, sfDir)
      val corpus = emb2.filter(col("vec_id") =!= 0)
      val q = emb2.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(
        corpus, col("vec_id"), col("embedding"), q, k = 10)
      timed("exact noop") { noop(exact) }
      val (cents, cbs2, codes) = timed("loadIvfPqIndex") {
        Similarity.loadIvfPqIndex(fresh, path)
      }
      val qv = timed("q.collect") { q.collect().head.getSeq[Float](0).toArray }
      val full = Similarity.ivfPqTopK(cents, cbs2, codes, corpus,
        col("vec_id"), col("embedding"), qv, k = 10, nProbe = 8,
        rerankN = 1 << 20)
      timed("full probe noop") { noop(full) }
      val partial = Similarity.ivfPqTopK(cents, cbs2, codes, corpus,
        col("vec_id"), col("embedding"), qv, k = 10, nProbe = 3,
        rerankN = 100)
      timed("partial probe noop") { noop(partial) }
      val fullStats = Similarity.recallStats(exact, full, Seq("id", "sim"))
      val partStats = Similarity.recallStats(exact, partial, Seq("id"))
        .select(col("n_hit").as("n_hit_partial"))
      timed("stats noop (recomputes subtrees)") {
        noop(fullStats.crossJoin(partStats).select(
          col("n_exact"),
          (col("n_approx") === col("n_exact") &&
            col("n_hit") === col("n_exact")).as("full_probe_exact"),
          (col("n_hit_partial") >= col("n_exact") * 0.5)
            .as("partial_recall_ok")))
      }
    }

    if (which("q193")) section("q193_lsh_reload_probe") {
      val nBits = 8
      val emb = Tables.embeddings(spark, sfDir)
      val old = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) =!= 3)
      val shard = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) === 3)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_r20_q193"
      timed("writeLshIndex") {
        Similarity.writeLshIndex(old, col("vec_id"), col("embedding"), nBits,
          path)
      }
      timed("appendToLshIndex") {
        Similarity.appendToLshIndex(shard, col("vec_id"), col("embedding"),
          path)
      }
      val fresh = spark.newSession()
      val emb2 = Tables.embeddings(fresh, sfDir)
      val corpus = emb2.filter(col("vec_id") =!= 0)
      val q = emb2.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(
        corpus, col("vec_id"), col("embedding"), q, k = 10)
      timed("exact noop") { noop(exact) }
      val (nb, loaded) = timed("loadLshIndex") {
        Similarity.loadLshIndex(fresh, path)
      }
      val full = Similarity.lshTopK(loaded, q, k = 10, nBits = nb,
        probeHamming = nb)
      timed("full probe noop") { noop(full) }
      val partial = Similarity.lshTopKPruned(loaded, q, k = 10, nBits = nb,
        probeHamming = 2)
      timed("partial probe noop") { noop(partial) }
      val fullStats = Similarity.recallStats(exact, full, Seq("id", "sim"))
      val partStats = Similarity.recallStats(exact, partial, Seq("id"))
        .select(col("n_hit").as("n_hit_partial"))
      timed("stats noop (recomputes subtrees)") {
        noop(fullStats.crossJoin(partStats).select(
          col("n_exact"),
          (col("n_approx") === col("n_exact") &&
            col("n_hit") === col("n_exact")).as("full_probe_exact"),
          (col("n_hit_partial") >= col("n_exact") * 0.3)
            .as("partial_recall_ok")))
      }
    }

    if (which("q186")) section("q186_hard_negatives_ann") {
      val emb = Tables.embeddings(spark, sfDir)
      val anchors = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val exact = Similarity.hardNegatives(
        emb, col("vec_id"), col("embedding"), col("label"), anchors, k = 5)
      timed("exact noop") { noop(exact) }
      val n = timed("emb.count") { emb.count() }
      val full = Similarity.hardNegativesShortlist(
        emb, col("vec_id"), col("embedding"), col("label"), anchors,
        k = 5, inDim = 64, outDim = 16, shortlist = 1 << 20)
      timed("full shortlist noop") { noop(full) }
      val partial = Similarity.hardNegativesShortlist(
        emb, col("vec_id"), col("embedding"), col("label"), anchors,
        k = 5, inDim = 64, outDim = 16,
        shortlist = math.max(50L, n * 3 / 10).toInt)
      timed("partial shortlist noop") { noop(partial) }
      val fullStats = Similarity.recallStats(exact, full,
        Seq("anchor_id", "rank", "neg_id", "neg_label", "sim"))
      val partStats = Similarity.recallStats(exact, partial,
          Seq("anchor_id", "neg_id"))
        .select(col("n_hit").as("n_hit_partial"))
      timed("stats noop (recomputes subtrees)") {
        noop(fullStats.crossJoin(partStats).select(
          col("n_exact"),
          (col("n_approx") === col("n_exact") &&
            col("n_hit") === col("n_exact")).as("full_shortlist_exact"),
          (col("n_hit_partial") >= col("n_exact") * 0.5)
            .as("partial_recall_ok")))
      }
    }

    if (which("q191")) section("q191_ivf_append_probe") {
      val emb = Tables.embeddings(spark, sfDir)
      val old = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) =!= 3)
      val shard = emb.filter(col("vec_id") =!= 0 &&
        pmod(col("vec_id"), lit(5)) === 3)
      val (centroids, indexed) = timed("ivfIndex fit") {
        Similarity.ivfIndex(old, col("vec_id"), col("embedding"), nLists = 8)
      }
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_r20_q191"
      timed("writeIvfIndex") {
        Similarity.writeIvfIndex(centroids, indexed, path)
      }
      timed("appendToIvfIndex") {
        Similarity.appendToIvfIndex(shard, col("vec_id"), col("embedding"),
          path)
      }
      val fresh = spark.newSession()
      val emb2 = Tables.embeddings(fresh, sfDir)
      val corpus = emb2.filter(col("vec_id") =!= 0)
      val q = emb2.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(
        corpus, col("vec_id"), col("embedding"), q, k = 10)
      timed("exact noop") { noop(exact) }
      val (cents, lists) = timed("loadIvfIndex") {
        Similarity.loadIvfIndex(fresh, path)
      }
      val qv = timed("q.collect") { q.collect().head.getSeq[Float](0).toArray }
      val full = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 8)
      timed("full probe noop") { noop(full) }
      val partial = Similarity.ivfTopK(cents, lists, qv, k = 10, nProbe = 3)
      timed("partial probe noop") { noop(partial) }
      val fullStats = Similarity.recallStats(exact, full, Seq("id", "sim"))
      val partStats = Similarity.recallStats(exact, partial, Seq("id"))
        .select(col("n_hit").as("n_hit_partial"))
      timed("stats noop (recomputes subtrees)") {
        noop(fullStats.crossJoin(partStats).select(
          col("n_exact"),
          (col("n_approx") === col("n_exact") &&
            col("n_hit") === col("n_exact")).as("full_probe_exact"),
          (col("n_hit_partial") >= col("n_exact") * 0.5)
            .as("partial_recall_ok")))
      }
    }

    spark.stop()
  }
}
