package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Composed IVF+PQ recall probe (manual; pins q196's partial floor
  * from measurement, not hope — the PqProbe/HardNegAnnProbe
  * discipline): q196's exact composition — artifacts fit on 4/5,
  * durable write, 1/5 appended, fresh-session reload — then the full
  * completeness gate (all lists + corpus-sized rerank must equal exact
  * brute force) and the partial recall surface over (nProbe, rerankN).
  * Run: sbt "Test/runMain graft.tools.IvfPqProbe [sfDir]"
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val old = corpus.filter(pmod(col("vec_id"), lit(5)) =!= 3)
    val shard = corpus.filter(pmod(col("vec_id"), lit(5)) === 3)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qv = q.collect().head.getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(
      corpus, col("vec_id"), col("embedding"), q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    println(s"exact top-10: $exact")
    val (centroids, _) = Similarity.ivfIndex(
      old, col("vec_id"), col("embedding"), nLists = 8)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val cbs = Similarity.ivfPqFitCodebooks(
      old, col("vec_id"), col("embedding"), centroids,
      m = 16, ksub = 16, iters = iters)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_probe"
    Similarity.writeIvfPqIndex(centroids, cbs,
      Similarity.ivfPqEncode(
        old, col("vec_id"), col("embedding"), centroids, cbs), path)
    Similarity.appendToIvfPqIndex(
      shard, col("vec_id"), col("embedding"), path)
    val fresh = spark.newSession()
    val (cents, cbs2, codes) = Similarity.loadIvfPqIndex(fresh, path)
    val corpus2 = Tables.embeddings(fresh, dir).filter(col("vec_id") =!= 0)
    for (nProbe <- Seq(8, 3); rerank <- Seq(1 << 20, 200, 100, 50)) {
      val approx = Similarity.ivfPqTopK(cents, cbs2, codes, corpus2,
          col("vec_id"), col("embedding"), qv, k = 10,
          nProbe = nProbe, rerankN = rerank)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val hitIds = approx.map(_._1).toSet
      val recall = exact.count(e => hitIds.contains(e._1)) / 10.0
      val equal = approx == exact
      println(f"nProbe=$nProbe rerankN=$rerank%8d recall=$recall%.2f identical=$equal")
    }
    spark.stop()
  }
}
