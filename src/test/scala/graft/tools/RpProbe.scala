package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables
object RpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, dir)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(corpus, col("vec_id"), col("embedding"), q, k = 10)
      val n = corpus.count()
      for (frac <- Seq(0.1, 0.2, 0.3, 0.5)) {
        val sl = math.max(50L, (n * frac).toLong).toInt
        val p = Similarity.projectedTopK(corpus, col("vec_id"), col("embedding"), q,
          inDim = 64, outDim = 16, shortlist = sl, k = 10)
        val hit = Similarity.recallStats(exact, p, Seq("id")).collect()(0)
        println(s"PROBE dir=$dir n=$n frac=$frac shortlist=$sl n_hit=${hit.getAs[Long]("n_hit")}")
      }
      // also outDim=32
      for (frac <- Seq(0.1, 0.2)) {
        val sl = math.max(50L, (n * frac).toLong).toInt
        val p = Similarity.projectedTopK(corpus, col("vec_id"), col("embedding"), q,
          inDim = 64, outDim = 32, shortlist = sl, k = 10)
        val hit = Similarity.recallStats(exact, p, Seq("id")).collect()(0)
        println(s"PROBE32 dir=$dir n=$n frac=$frac shortlist=$sl n_hit=${hit.getAs[Long]("n_hit")}")
      }
    }
    spark.stop()
  }
}
