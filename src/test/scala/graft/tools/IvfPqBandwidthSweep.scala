package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** The bytes-per-probe measurement behind the composed index (round-18
  * verdict rationale made a number): at growing embedding dimension,
  * a plain-IVF probe reads full float vectors of every row in the
  * probed stripes while the IVF+PQ probe reads ONE long per row + a
  * rerankN-row vector fetch — so the gap should grow ~linearly with d.
  * The corpus is the sf embeddings tiled to dimension d (d/64 copies,
  * a pure map) and replicated `rep`× by id-salting (vectors unchanged
  * — this sweep measures PROBE BANDWIDTH, recall is q196/q197's gate).
  * Both indexes land durable; probes run against FRESH-session reloads
  * (the file listing + pruned read is the measured thing), warm pass
  * then min of three. Stripe bytes are the on-disk `lists/` totals.
  * Run: sbt "Test/runMain graft.tools.IvfPqBandwidthSweep [sfDir] [rep]"
  */
object IvfPqBandwidthSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local()
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    def minOf3(probe: => Unit): Double = {
      probe
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); probe; (System.nanoTime() - t0) / 1e9
      }.min
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println(f"${"d"}%5s ${"rows"}%8s ${"ivf_MB"}%8s ${"pq_MB"}%8s " +
      f"${"ivf_probe_s"}%12s ${"pq_probe_s"}%12s ${"bytes_ratio"}%12s")
    for (d <- Seq(64, 256, 1024)) {
      val tiles = d / 64
      // Per-COMPONENT deterministic hash noise, two jobs at once:
      // identical replicas would collapse PQ init codewords (duplicate
      // smallest-id subvectors -> dead clusters -> the non-power-of-2
      // loud failure, correctly), and constant-per-replica offsets
      // leave the tiled floats 8x parquet-compressible — real
      // embeddings are not, and a compressible fixture understates
      // exactly the bytes this sweep measures.
      val salted = emb.filter(col("vec_id") =!= 0)
        .crossJoin(spark.range(rep).select(col("id").as("rep_i")))
        .select((col("vec_id") * rep + col("rep_i")).as("vec_id"),
          col("embedding"))
      val corpus = salted.select(col("vec_id"),
        zip_with(
          flatten(array_repeat(col("embedding"), tiles)),
          transform(sequence(lit(0), lit(d - 1)), i =>
            (pmod(xxhash64(col("vec_id") * lit(10007L) + i), lit(100000L))
              / lit(1e7d)).cast("float")),
          (x, n) => x + n).as("embedding"))
      val qd = q.select(
        flatten(array_repeat(col("qv"), tiles)).as("qv"))
      val qv = qd.collect().head.getSeq[Float](0).toArray
      // Bounded fit sample: the sweep times probes, not fits — 2k
      // points × d doubles keeps the driver fit trivial at d=1024.
      val (cents, indexed) = Similarity.ivfIndex(
        corpus, col("vec_id"), col("embedding"), nLists = 8,
        fitSampleRows = 2000L)
      val ivfPath = s"${System.getProperty("java.io.tmpdir")}/graft_bw_ivf_$d"
      Similarity.writeIvfIndex(cents, indexed, ivfPath)
      val cbs = Similarity.ivfPqFitCodebooks(
        corpus, col("vec_id"), col("embedding"), cents, m = 16, ksub = 16,
        iters = 1)
      val pqPath = s"${System.getProperty("java.io.tmpdir")}/graft_bw_ivfpq_$d"
      Similarity.writeIvfPqIndex(cents, cbs,
        Similarity.ivfPqEncode(
          corpus, col("vec_id"), col("embedding"), cents, cbs), pqPath)

      val fresh = spark.newSession()
      val (c1, lists) = Similarity.loadIvfIndex(fresh, ivfPath)
      val tIvf = minOf3(noop(
        Similarity.ivfTopK(c1, lists, qv, k = 10, nProbe = 3)))
      val (c2, cb2, codes) = Similarity.loadIvfPqIndex(fresh, pqPath)
      // The rerank's corpus side is the durable IVF lists themselves
      // (id, v) — the "full vectors fetched by id from cold storage"
      // shape, not an in-memory frame.
      val corpusCold = fresh.read.parquet(s"$ivfPath/lists")
      val tPq = minOf3(noop(
        Similarity.ivfPqTopK(c2, cb2, codes, corpusCold,
          col("id"), col("v"), qv, k = 10, nProbe = 3, rerankN = 100)))
      val bIvf = dirBytes(s"$ivfPath/lists")
      val bPq = dirBytes(s"$pqPath/lists")
      val nRows = corpus.count()
      println(f"$d%5d $nRows%8d ${bIvf / 1e6}%8.1f ${bPq / 1e6}%8.1f " +
        f"$tIvf%12.3f $tPq%12.3f ${bIvf.toDouble / bPq}%12.1f")
    }
    spark.stop()
  }
}
