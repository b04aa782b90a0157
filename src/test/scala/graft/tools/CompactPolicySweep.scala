package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Policy-at-the-knee demonstration (round-18 verdict item: the knee
  * must be a TRIGGER, not just a measurement): build a durable IVF
  * index, fold in nightly appends one at a time, and after each night
  * ask `compactIfNeeded` at the DEFAULT knobs — it must stay a no-op
  * through the measured-safe regime and fire exactly when the
  * per-stripe file count crosses `DefaultMaxFilesPerStripe`, restoring
  * one file per stripe. Nights are modeled as tiny shards (each append
  * adds ≤1 file per touched stripe under the clustered writers — the
  * IndexCompactionSweep accretion shape).
  * Run: sbt "Test/runMain graft.tools.CompactPolicySweep [sfDir] [nights]"
  */
object CompactPolicySweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nights = args.lift(1).map(_.toInt).getOrElse(70)
    val spark = GraftSession.local()
    val emb = Tables.embeddings(spark, dir).persist()
    val base = emb.filter(col("vec_id") % (nights + 1) === 0)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_policy_sweep"
    val (centroids, indexed) = Similarity.ivfIndex(
      base, col("vec_id"), col("embedding"), nLists = 4)
    Similarity.writeIvfIndex(centroids, indexed, path)
    def health(): (Int, Boolean) = {
      val h = Similarity.indexHealth(spark, path).collect().head
      (h.getAs[Int]("max_files_per_stripe"),
        h.getAs[Boolean]("needs_compaction"))
    }
    var fired = -1
    for (night <- 1 to nights) {
      Similarity.appendToIvfIndex(
        emb.filter(col("vec_id") % (nights + 1) === night),
        col("vec_id"), col("embedding"), path)
      val (maxF, due) = health()
      val ran = Similarity.compactIfNeeded(spark, path)
      if (ran && fired < 0) fired = night
      if (night % 16 == 0 || ran)
        println(f"night=$night%3d max_files_per_stripe=$maxF%3d " +
          f"needs=$due fired=$ran after=${health()._1}")
    }
    println(s"first fired at night $fired " +
      s"(DefaultMaxFilesPerStripe=${Similarity.DefaultMaxFilesPerStripe})")
    spark.stop()
  }
}
