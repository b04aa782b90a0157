package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Measured partial-probe recall behind q195's floor (the
  * q78/q128/q186 probe-tool discipline): exhaustive hardNegatives vs
  * the durable-IVF-index shortlist path at nProbe = 3/8 and a
  * 30%-of-corpus shortlist, per SF. The FLOOR in the query is the
  * contract; the numbers printed here are its measured margin,
  * recorded in the q195 scaladoc.
  *
  * Run: sbt "Test/runMain graft.tools.HardNegAnnProbe [sfDir ...]"
  */
object HardNegAnnProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    dirs.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      val (centroids, indexed) = Similarity.ivfIndex(
        emb, col("vec_id"), col("embedding"), nLists = 8)
      val anchors = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val exact = Similarity.hardNegatives(
        emb, col("vec_id"), col("embedding"), col("label"), anchors, k = 5)
      val n = emb.count()
      val partial = Similarity.hardNegativesAnn(centroids, indexed,
        emb, col("vec_id"), col("embedding"), col("label"), anchors,
        k = 5, nProbe = 3, shortlist = math.max(50L, n * 3 / 10).toInt)
      val row = Similarity.recallStats(exact, partial,
        Seq("anchor_id", "neg_id")).collect().head
      val (nE, nH) = (row.getLong(0), row.getLong(2))
      println(f"$dir: n=$n n_exact=$nE n_hit=$nH recall=${nH.toDouble / nE}%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
