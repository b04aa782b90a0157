package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Raw-ADC vs residual-ADC at a MATCHED byte budget (one packed long
  * per row, m=16 × ksub=16, iters=1) — the measurement behind the
  * composed family's `encoding` convention ([[Similarity
  * .IvfPqCodebooks]]): which quantization target wins is a DATA
  * property, so the fit's auto mode measures instead of assuming.
  *
  * Two corpora per run:
  *   - the synthetic TEST embeddings (near-isotropic: IVF centroids
  *     capture little direction, residuals are LONGER than the unit
  *     vectors — raw should win);
  *   - a deterministic CLUSTERED mixture (every vector = one of 16
  *     xxhash-seeded cluster directions + small noise — the production
  *     embedding shape; residuals should win).
  *
  * Both sides scan every code (the raw side probes at nProbe = nLists
  * too), so probe-leg loss is zero and the rerankN sweep isolates pure
  * ADC ORDERING quality. Recall vs exhaustive brute-force top-10 for
  * the vec_id-0 query; the `auto` column is what
  * [[Similarity.ivfPqFitCodebooks]] picks for that corpus.
  *
  * Run: sbt "Test/runMain graft.tools.ResidualGainSweep [sfDir ...]"
  */
object ResidualGainSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    // Deterministic clustered mixture: cluster c = id mod 16, each
    // cluster a fixed pseudo-random direction (xxhash64-seeded, the
    // repo's zero-dependency noise convention), vector = direction +
    // 0.5 · per-id noise — within-cluster spread large enough that
    // neighbor order is PQ-resolvable, small enough that lists ≈
    // clusters. d = 64 like the test embeddings.
    def clustered(n: Long): DataFrame = {
      val ids = spark.range(1, n + 1).select(col("id").as("vec_id"))
      val dims = sequence(lit(0), lit(63))
      def unit01(seed: org.apache.spark.sql.Column) =
        (pmod(xxhash64(seed), lit(100000L)) / lit(100000.0d)) - lit(0.5d)
      ids.select(col("vec_id"),
        zip_with(
          transform(dims, i =>
            unit01(pmod(col("vec_id"), lit(16)) * lit(131L) + i)),
          transform(dims, i => unit01(col("vec_id") * lit(10007L) + i)),
          (c, e) => (c + lit(0.5d) * e).cast("float")).as("embedding"))
    }

    def sweep(name: String, emb: DataFrame): Unit = {
      // Mean recall@10 over a 20-query batch (single-query recall has
      // 0.1 granularity — two flipped hits read as a ±0.2 swing).
      val queries = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopKBatch(
          emb, col("vec_id"), col("embedding"),
          queries.select(col("vec_id").as("qid"),
            col("embedding").as("qv")),
          col("qid"), col("qv"), k = 10)
        .select(col("query_id"), col("id")).persist()
      val nExact = exact.count()
      val (cents, _) = Similarity.ivfIndex(
        emb, col("vec_id"), col("embedding"), nLists = 8)
      def fit(enc: String) = Similarity.ivfPqFitCodebooks(
        emb, col("vec_id"), col("embedding"), cents,
        m = 16, ksub = 16, iters = 1, encoding = enc)
      val rawCbs = fit("raw"); val resCbs = fit("residual")
      val auto = fit("auto")
      def encode(cbs: Similarity.IvfPqCodebooks) = Similarity.ivfPqEncode(
        emb, col("vec_id"), col("embedding"), cents, cbs).persist()
      val rawEnc = encode(rawCbs); rawEnc.count()
      val resEnc = encode(resCbs); resEnc.count()
      println(s"| corpus | rerankN | raw-ADC | residual-ADC | auto picks |")
      println(s"|---|---|---|---|---|")
      for (rerank <- Seq(200, 100, 50, 25)) {
        def recall(cbs: Similarity.IvfPqCodebooks, e: DataFrame): Double = {
          val approx = Similarity.ivfPqTopKBatch(cents, cbs, e, emb,
            col("vec_id"), col("embedding"), queries,
            col("vec_id"), col("embedding"),
            k = 10, nProbe = 8, rerankN = rerank)
          val hits = approx.select(col("query_id"), col("id"))
            .join(exact, Seq("query_id", "id"), "left_semi").count()
          hits.toDouble / nExact
        }
        val raw = recall(rawCbs, rawEnc)
        val res = recall(resCbs, resEnc)
        println(f"| $name | $rerank | $raw%.2f | $res%.2f | ${auto.encoding} |")
      }
      rawEnc.unpersist(); resEnc.unpersist(); exact.unpersist()
      spark.catalog.clearCache()
    }

    dirs.foreach { dir =>
      sweep(dir.split('/').last, Tables.embeddings(spark, dir))
    }
    Seq(2000L, 20000L).foreach { n =>
      sweep(s"clustered-$n", clustered(n))
    }
    spark.stop()
  }
}
