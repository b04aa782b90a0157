package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** PQ recall probe (manual; pins q89's partial-rerank floor from
  * measurement, not hope): exact top-10 for query vec 0 vs PQ-ADC at
  * full rerank (must be identical) and at small rerankN values.
  * Run: sbt "Test/runMain graft.tools.PqProbe [sfDir]"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") =!= 0)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qv = q.collect().head.getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(
      corpus, col("vec_id"), col("embedding"), q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    println(s"exact top-10: $exact")
    val (cbs, encoded) = Similarity.pqIndex(
      corpus, col("vec_id"), col("embedding"), m = 16, ksub = 16, iters = 2)
    encoded.persist().count()
    for (rerank <- Seq(1 << 20, 100, 50, 20, 10)) {
      val approx = Similarity.pqTopK(cbs, encoded, corpus,
          col("vec_id"), col("embedding"), qv, k = 10, rerankN = rerank)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val hitIds = approx.map(_._1).toSet
      val recall = exact.count(e => hitIds.contains(e._1)) / 10.0
      val equal = approx == exact
      println(f"rerankN=$rerank%8d recall=$recall%.2f identical=$equal")
    }
    spark.stop()
  }
}
