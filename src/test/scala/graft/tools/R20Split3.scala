package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Round-20: is the 254-stripe partitionBy write task-side (parquet
  * writer per stripe) or driver-side (sequential commit renames)?
  * Tries committer algorithm v2 and concurrent-job overlap. */
object R20Split3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r20split3] $name%-52s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) =!= 3)
    val tmp = System.getProperty("java.io.tmpdir")
    val bucketed = Similarity.bucketize(
      old, col("vec_id"), col("embedding"), 8)

    for (pass <- 1 to 2) {
      println(s"[r20split3] ---- pass $pass ----")
      timed("partitionBy v1 committer (baseline)") {
        bucketed.repartition(col("bucket"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("bucket").parquet(s"$tmp/r20_v1")
      }
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 2)
      timed("partitionBy v2 committer") {
        bucketed.repartition(col("bucket"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("bucket").parquet(s"$tmp/r20_v2")
      }
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 1)
      // More tasks: spread 254 stripes over 254 tasks instead of 32 so
      // per-file writer setup parallelizes across the 32 cores.
      timed("partitionBy v1, repartition(254, bucket)") {
        bucketed.repartition(254, col("bucket"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("bucket").parquet(s"$tmp/r20_v1_254")
      }
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 2)
      timed("partitionBy v2, repartition(254, bucket)") {
        bucketed.repartition(254, col("bucket"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("bucket").parquet(s"$tmp/r20_v2_254")
      }
      spark.sparkContext.hadoopConfiguration.setInt(
        "mapreduce.fileoutputcommitter.algorithm.version", 1)
    }
    spark.stop()
  }
}
