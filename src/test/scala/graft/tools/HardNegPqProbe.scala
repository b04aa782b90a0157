package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Measured partial-probe recall behind q198's floor ([[
  * HardNegAnnProbe]]'s discipline for the COMPOSED index): exhaustive
  * hardNegatives vs the IVF+PQ code-stripe shortlist path at
  * nProbe = 3/8 and a 30%-of-corpus shortlist, per SF — q195's
  * measurement with the ADC leg's loss included. The FLOOR in the
  * query is the contract; the numbers printed here are its measured
  * margin, recorded in the q198 scaladoc.
  *
  * Run: sbt "Test/runMain graft.tools.HardNegPqProbe [sfDir ...]"
  */
object HardNegPqProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    dirs.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      val (centroids, _) = Similarity.ivfIndex(
        emb, col("vec_id"), col("embedding"), nLists = 8)
      val cbs = Similarity.ivfPqFitCodebooks(
        emb, col("vec_id"), col("embedding"), centroids,
        m = 16, ksub = 16, iters = 1)
      val indexed = Similarity.ivfPqEncode(
        emb, col("vec_id"), col("embedding"), centroids, cbs)
      val anchors = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val exact = Similarity.hardNegatives(
        emb, col("vec_id"), col("embedding"), col("label"), anchors, k = 5)
      val n = emb.count()
      val partial = Similarity.hardNegativesAnnPq(centroids, cbs, indexed,
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
