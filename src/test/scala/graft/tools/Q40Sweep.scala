package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.PipelineQueries
import graft.sources.Tables

/** Spark-side half of the q40 scale sweep (manual; BASELINE.md): writes
  * K-replicated copies of the sf0.1 documents table (ids shifted, text
  * identical — distinct-shingle cardinality constant, count work ×K) to
  * /tmp/q40sweep/k<K>/documents.parquet and times the full q40 build+run
  * (warmup + min of 2, the Bench methodology). The DuckDB half runs the
  * q40 oracle SQL against the same parquet files.
  * Run: sbt "Test/runMain graft.tools.Q40Sweep [K...]"
  */
object Q40Sweep {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 8, 16)
    val spark = GraftSession.local()
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    for (k <- ks) {
      val dir = s"/tmp/q40sweep/k$k"
      val big = (0 until k).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      }.reduce(_ unionByName _)
      big.repartition(8).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/documents.parquet")
      def once(): Double = {
        val t0 = System.nanoTime()
        PipelineQueries.q40TopNgrams(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val t = math.min(once(), once())
      println(f"q40sweep K=$k%-3d docs=${5000L * k}%-7d spark=$t%.3f s")
    }
    spark.stop()
  }
}
