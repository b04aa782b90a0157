package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Round-20 micro-splitter: where does writeLshIndex's ~5 s go, and
  * what does one tiny parquet write / one fit iteration cost? */
object R20Split2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r20split2] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) =!= 3)
    val tmp = System.getProperty("java.io.tmpdir")

    // Pass twice: warm then timed.
    for (pass <- 1 to 2) {
      println(s"[r20split2] ---- pass $pass ----")
      // 1. The bucketed data write alone (nBits=8 -> up to 256 stripes).
      val bucketed = Similarity.bucketize(
        old, col("vec_id"), col("embedding"), 8)
      timed("bucketize+repartition+partitionBy write") {
        bucketed.repartition(col("bucket"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("bucket").parquet(s"$tmp/r20_lsh_buckets")
      }
      // 1b. Same rows, no partitionBy (one dir).
      timed("bucketize write flat (no partitionBy)") {
        bucketed.repartition(col("bucket"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$tmp/r20_lsh_flat")
      }
      // 1c. partitionBy write WITHOUT the repartition.
      timed("bucketize write partitionBy, no repartition") {
        bucketed
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("bucket").parquet(s"$tmp/r20_lsh_norep")
      }
      // 2. One tiny local-relation write.
      timed("tiny meta write (1 row)") {
        Seq(Tuple1(8)).toDF("n_bits")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$tmp/r20_meta")
      }
      // 3. Empty tombstone seed.
      timed("empty tombstone seed") {
        spark.range(0).select(col("id")).coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$tmp/r20_tomb")
      }
      // 4. The IVF-PQ codebook fit, by stage.
      val (centroids, _) = timed("ivfIndex fit (sample+lloyd+assign lazy)") {
        Similarity.ivfIndex(old, col("vec_id"), col("embedding"), nLists = 8)
      }
      timed("ivfPqFitCodebooks iters=1") {
        Similarity.ivfPqFitCodebooks(old, col("vec_id"), col("embedding"),
          centroids, m = 16, ksub = 16, iters = 1)
      }
      val cbs = Similarity.ivfPqFitCodebooks(old, col("vec_id"),
        col("embedding"), centroids, m = 16, ksub = 16, iters = 1)
      // 5. The encode pass alone (noop) then the composed write.
      val enc = Similarity.ivfPqEncode(
        old, col("vec_id"), col("embedding"), centroids, cbs)
      timed("ivfPqEncode noop") {
        enc.write.format("noop").mode("overwrite").save()
      }
      timed("writeIvfPqIndex (encode+4 writes+seed)") {
        Similarity.writeIvfPqIndex(centroids, cbs, enc, s"$tmp/r20_ivfpq")
      }
    }
    spark.stop()
  }
}
