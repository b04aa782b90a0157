package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Measure-before-building for the round-18 verdict's stretch: would
  * an int8 scalar-quantized copy of the rerank vectors (4× smaller
  * fetch) pay on the composed probe path? The rerank fetches rerankN
  * survivors BY PUSHED ID FILTER from the float corpus; parquet must
  * decode the vector column chunk of every row group the id filter
  * touches, so the candidate saving is (touched row groups) × (rows/
  * group) × d × 3 bytes. This sweep isolates that leg at d = 1024
  * (the worst measured case): the full composed probe, the float
  * id-fetch leg alone, and the same fetch from an int8 copy
  * (per-vector max-abs scale, dequantized in-expression) — warm,
  * min of three each.
  * Run: sbt "Test/runMain graft.tools.SqRerankSweep [sfDir] [rep]"
  */
object SqRerankSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local()
    def minOf3(probe: => Unit): Double = {
      probe
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); probe; (System.nanoTime() - t0) / 1e9
      }.min
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val d = 1024
    val tiles = d / 64
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
    val qv = q.select(flatten(array_repeat(col("qv"), tiles)).as("qv"))
      .collect().head.getSeq[Float](0).toArray
    val (cents, indexed) = Similarity.ivfIndex(
      corpus, col("vec_id"), col("embedding"), nLists = 8,
      fitSampleRows = 2000L)
    val tmp = System.getProperty("java.io.tmpdir")
    val ivfPath = s"$tmp/graft_sq_ivf_$d"
    Similarity.writeIvfIndex(cents, indexed, ivfPath)
    val cbs = Similarity.ivfPqFitCodebooks(
      corpus, col("vec_id"), col("embedding"), cents, m = 16, ksub = 16,
      iters = 1)
    val pqPath = s"$tmp/graft_sq_ivfpq_$d"
    Similarity.writeIvfPqIndex(cents, cbs,
      Similarity.ivfPqEncode(
        corpus, col("vec_id"), col("embedding"), cents, cbs), pqPath)
    // int8 copy beside the floats: (id, s = maxabs/127, q = int8[d]).
    val sqPath = s"$tmp/graft_sq_int8_$d"
    val fl = spark.read.parquet(s"$ivfPath/lists")
    fl.select(col("id"),
        (aggregate(transform(col("v"), x => abs(x)), lit(0.0f),
          (a, x) => greatest(a, x)) / lit(127.0f)).as("s"),
        col("v"))
      .select(col("id"), col("s"),
        transform(col("v"), x =>
          round(x / col("s")).cast("tinyint")).as("q"))
      .write.mode("overwrite").parquet(sqPath)
    def mb(p: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p)) / 1e6
    }
    val fresh = spark.newSession()
    val (c2, cb2, codes) = Similarity.loadIvfPqIndex(fresh, pqPath)
    val corpusCold = fresh.read.parquet(s"$ivfPath/lists")
    val sqCold = fresh.read.parquet(sqPath)
    // Leg 0: the full composed probe (shortlist + float rerank).
    val tProbe = minOf3(noop(
      Similarity.ivfPqTopK(c2, cb2, codes, corpusCold,
        col("id"), col("v"), qv, k = 10, nProbe = 3, rerankN = 100)))
    // Legs 1/2: the id-fetch alone — the same 100-id pushed filter
    // against the float table vs the int8 copy (dequant + cosine in
    // expression so the decode work is comparable).
    val ids = Similarity.ivfPqTopK(c2, cb2, codes, corpusCold,
        col("id"), col("v"), qv, k = 100, nProbe = 3, rerankN = 100)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    val qvLit = typedLit(qv.map(_.toDouble).toSeq)
    def ddot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val tFloatFetch = minOf3(noop(
      corpusCold.filter(col("id").isin(ids: _*))
        .select(col("id"),
          (ddot(transform(col("v"), _.cast("double")), qvLit) /
            sqrt(ddot(transform(col("v"), _.cast("double")),
              transform(col("v"), _.cast("double"))))).as("sim"))))
    val tSqFetch = minOf3(noop(
      sqCold.filter(col("id").isin(ids: _*))
        .select(col("id"),
          (ddot(transform(col("q"), x => x.cast("double") * col("s")), qvLit) /
            sqrt(ddot(transform(col("q"), x => x.cast("double") * col("s")),
              transform(col("q"), x => x.cast("double") * col("s")))))
            .as("sim"))))
    println(f"d=$d rows=${corpusCold.count()} float_MB=${mb(s"$ivfPath/lists")}%.1f int8_MB=${mb(sqPath)}%.1f")
    println(f"composed_probe_s=$tProbe%.3f float_fetch_s=$tFloatFetch%.3f int8_fetch_s=$tSqFetch%.3f")
    println(f"fetch_share_of_probe=${tFloatFetch / tProbe * 100}%.0f%% " +
      f"fetch_speedup=${tFloatFetch / tSqFetch}%.2fx " +
      f"probe_saving_if_adopted=${(tFloatFetch - tSqFetch) / tProbe * 100}%.0f%%")
    spark.stop()
  }
}
