package graft.tools
import graft.{GraftSession, SparkEntry}
/** One-off: print q76's executed plan (bloom probe must be codegen'd
  * map-side, before the per-doc aggregation's shuffle).
  * Run: sbt "Test/runMain graft.tools.Q76Plan" */
object Q76Plan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.queries("q76_bloom_decontam")(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
