package graft.tools
import graft.{GraftSession, SparkEntry}
/** One-off: print q77's executed plan (window-hash aggregation must be
  * partial+final, the islands window partitioned by doc).
  * Run: sbt "Test/runMain graft.tools.SpanPlan [queryName]" */
object SpanPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q77_repeated_spans")
    val spark = GraftSession.local()
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
